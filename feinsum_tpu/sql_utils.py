"""
The transform archive: an sqlite database of timing facts keyed by the
*canonicalized* einsum, mirroring the reference's v6 schema
(``feinsum/sql_utils.py:399-414``): one table ``FEINSUM_TIMING_FACTS`` with
columns (subscripts, index_to_length, args, arg_to_dtype, device_name,
transform_id, transform_params, runtime_in_sec, compiler_version,
giga_op_info, timestamp).

Differences from the reference, by design:
  * ``device_name`` is the TPU generation key (e.g. ``TPU_v5_lite``) from
    ``jax.Device.device_kind``;
  * ``compiler_version`` records jax/jaxlib/libtpu versions instead of the
    OpenCL driver pair;
  * replayed transforms are schedule descriptors interpreted by the Pallas/XLA
    emitters, not loopy scripts; the DB stores (impl module id, params) the
    same way.

The DB *is* the checkpoint: every measured point INSERTs immediately; a
restarted tuning run seeds from prior rows and skips known configs
(reference sql_utils.py:487-509, tuning/__init__.py:418-521).
"""

from __future__ import annotations

import json
import logging
import os
import sqlite3
from dataclasses import dataclass
from functools import cached_property
from typing import Any, Callable, Optional

import numpy as np

from .canonicalization import canonicalize_einsum
from .data.device_info import get_device_key
from .diagnostics import NoFactInDatabaseError
from .einsum import INT_CLASSES, BatchedEinsum

logger = logging.getLogger(__name__)

DEFAULT_DB = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "data", "transform_archive_v1_tpu.sqlite")
TIMINGS_TABLENAME = "FEINSUM_TIMING_FACTS"


# {{{ dumps/loads (reference-compatible formats, sql_utils.py:56-98)

def dump_arg_to_dtype(einsum: BatchedEinsum) -> str:
    return json.dumps({a: dt.name for a, dt in einsum.arg_to_dtype.items()},
                      sort_keys=True)


def dump_index_to_length(einsum: BatchedEinsum) -> str:
    return json.dumps({k: int(v)
                       for k, v in einsum.index_to_dim_length.items()
                       if isinstance(v, INT_CLASSES)}, sort_keys=True)


def dump_arg_names(einsum: BatchedEinsum) -> str:
    return json.dumps([[a.name for a in row] for row in einsum.args])


# timing-protocol provenance tag appended to every new row's
# compiler_version: proto1 = chained in-graph loop (2x serialization bias),
# proto2 = differenced wall (unreliable both directions through the relay),
# proto3 = device-trace span clamped by the physics floor (current; see
# measure.timeit_on_device).  Lets data/bin/retire_rows.py purge rows
# measured under a retired protocol; retrieve() itself stays
# reference-parity (max rate over all rows).
TIMING_PROTOCOL_TAG = "timing-proto3"


def dump_compiler_version() -> str:
    import jax
    import jaxlib
    libtpu = ""
    try:
        import libtpu as _libtpu  # type: ignore
        libtpu = getattr(_libtpu, "__version__", "")
    except ImportError:
        pass
    return (f"jax-{jax.__version__}-jaxlib-{jaxlib.__version__}"
            + (f"-libtpu-{libtpu}" if libtpu else "")
            + f"-{TIMING_PROTOCOL_TAG}")


def dump_op_info(einsum: BatchedEinsum, long_dim_length: int) -> str:
    from .measure import evaluate_giga_op_map, get_giga_op_map
    vals = evaluate_giga_op_map(get_giga_op_map(einsum), long_dim_length)
    return json.dumps(vals, sort_keys=True)


def load_op_info(op_info: str) -> dict:
    return {np.dtype(k): v for k, v in json.loads(op_info).items()}


def _process_param(v: Any) -> Any:
    if isinstance(v, bool) or isinstance(v, int):
        return v
    if isinstance(v, list):
        return tuple(_process_param(x) for x in v)
    raise NotImplementedError(type(v))


def load_transform_params(params_str: str) -> dict:
    raw = json.loads(params_str)
    assert isinstance(raw, dict)
    return {k: _process_param(v) for k, v in raw.items()}

# }}}


@dataclass(frozen=True)
class QueryInfo:
    """One archived timing fact (reference sql_utils.py:136-157)."""

    transform_id: str
    transform_params: tuple   # frozen dict items
    runtime_in_sec: float
    compiler_version: str
    giga_op_info_json: str
    device_name: str
    _einsum: BatchedEinsum

    @cached_property
    def giga_op_info(self) -> dict:
        return load_op_info(self.giga_op_info_json)

    def giga_op_rate(self, dtype) -> float:
        return self.giga_op_info[np.dtype(dtype)] / self.runtime_in_sec

    @property
    def total_giga_op_rate(self) -> float:
        return sum(self.giga_op_info.values()) / self.runtime_in_sec

    @cached_property
    def transform(self) -> Callable:
        """Lazily import the impl module and bind the stored params
        (reference sql_utils.py:147-157)."""
        from .tuning import get_transform_func_from_module_path
        pt = get_transform_func_from_module_path(self.transform_id)
        return pt.bind_args(self._einsum, **dict(self.transform_params))


def _connect(db_path: str) -> sqlite3.Connection:
    os.makedirs(os.path.dirname(os.path.abspath(db_path)), exist_ok=True)
    conn = sqlite3.connect(db_path)
    conn.execute(f"""
        CREATE TABLE IF NOT EXISTS {TIMINGS_TABLENAME} (
            subscripts TEXT, index_to_length TEXT, args TEXT,
            arg_to_dtype TEXT, device_name TEXT, transform_id TEXT,
            transform_params TEXT, runtime_in_sec REAL,
            compiler_version TEXT, giga_op_info TEXT, timestamp TEXT
        )""")
    return conn


RETIRED_TABLENAME = "FEINSUM_RETIRED_FACTS"


def retire_rows_where(cond: str, binds, *, reason: str,
                      db_path: Optional[str] = None,
                      conn: Optional[sqlite3.Connection] = None) -> int:
    """Move timing rows matching the SQL *cond* into RETIRED_TABLENAME
    instead of deleting them (non-destructive retire).  Motivated by a live
    r4 incident: contention-polluted re-timings made the over-reporter
    retire pass delete two HONEST champion rows — with a stash, such
    mistakes are recoverable (data/bin/restore_retired.py).  Returns the
    number of rows moved."""
    own = conn is None
    if own:
        conn = _connect(db_path or DEFAULT_DB)
    try:
        conn.execute(f"""
            CREATE TABLE IF NOT EXISTS {RETIRED_TABLENAME} AS
            SELECT *, '' AS retire_reason, '' AS retired_at
            FROM {TIMINGS_TABLENAME} WHERE 0""")
        # insert by EXPLICIT column list (advisor r4): a stash created
        # against an older timings schema breaks `INSERT ... SELECT *`
        # with a column-count mismatch once the timings table grows —
        # ALTER the stash up to match instead
        cols = [r[1] for r in conn.execute(
            f"PRAGMA table_info({TIMINGS_TABLENAME})")]
        stash_cols = [r[1] for r in conn.execute(
            f"PRAGMA table_info({RETIRED_TABLENAME})")]
        for c in cols:
            if c not in stash_cols:
                conn.execute(
                    f"ALTER TABLE {RETIRED_TABLENAME} ADD COLUMN {c}")
        collist = ", ".join(cols)
        cur = conn.execute(
            f"INSERT INTO {RETIRED_TABLENAME}"
            f" ({collist}, retire_reason, retired_at)"
            f" SELECT {collist}, ?, datetime('now')"
            f" FROM {TIMINGS_TABLENAME} WHERE {cond}",
            [reason] + list(binds))
        n = cur.rowcount
        conn.execute(f"DELETE FROM {TIMINGS_TABLENAME} WHERE {cond}",
                     list(binds))
        if own:
            conn.commit()
        return n
    finally:
        if own:
            conn.close()


def query(einsum: BatchedEinsum, device=None, *,
          db_path: Optional[str] = None,
          err_if_no_results: bool = True) -> list:
    """All archived facts for (canonical *einsum*, *device*)
    (reference sql_utils.py:160-243)."""
    if db_path is None:
        db_path = DEFAULT_DB
    e = canonicalize_einsum(einsum)
    device_name = get_device_key(device)
    conn = _connect(db_path)
    try:
        rows = conn.execute(
            f"SELECT transform_id, transform_params, runtime_in_sec,"
            f" compiler_version, giga_op_info FROM {TIMINGS_TABLENAME}"
            f" WHERE subscripts = ? AND index_to_length = ? AND args = ?"
            f" AND arg_to_dtype = ? AND device_name = ?",
            (e.get_subscripts(), dump_index_to_length(e), dump_arg_names(e),
             dump_arg_to_dtype(e), device_name)).fetchall()
    finally:
        conn.close()
    if not rows and err_if_no_results:
        raise NoFactInDatabaseError(
            f"No facts for '{e.get_subscripts()}' on '{device_name}' in"
            f" {db_path}")
    return [
        QueryInfo(
            transform_id=tid,
            transform_params=tuple(sorted(
                load_transform_params(tparams).items())),
            runtime_in_sec=rt,
            compiler_version=cver,
            giga_op_info_json=ginfo,
            device_name=device_name,
            _einsum=e)
        for tid, tparams, rt, cver, ginfo in rows]


def aggregate_reconfirmations(qs: list) -> list:
    """Collapse re-timed copies of each distinct (transform_id, params)
    config into ONE representative row: the LOWER-MEDIAN-rate row of the
    config's re-times (proto3-tagged rows only, when any exist — mixing
    instruments would average apples and oranges).  Returned rows stay
    genuine archive rows (provenance intact), sorted fastest-first.

    Motivation (VERDICT r4 weak #3): champion selection by single fastest
    row lets a drifty config keep winning on its lucky sample — live
    2026-08-19: div10's parallel_grid+mfold row claimed 4323 GOp/s but
    re-measured 3112 (28% drift).  Re-confirmations now pull its effective
    rate down to what it actually reproduces; a config with one lucky row
    and one honest slow row ranks by the slow one (pessimistic lower
    median), so a consistently-reproducing runner-up can overtake it."""
    groups: dict = {}
    order: list = []
    for q in qs:
        key = (q.transform_id, q.transform_params)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(q)
    out = []
    for key in order:
        rows = groups[key]
        proto3 = [q for q in rows
                  if "timing-proto3" in (q.compiler_version or "")]
        rows = proto3 or rows
        rows = sorted(rows, key=lambda q: q.total_giga_op_rate)
        out.append(rows[(len(rows) - 1) // 2])
    out.sort(key=lambda q: q.total_giga_op_rate, reverse=True)
    return out


def retrieve(einsum: BatchedEinsum, device=None, *,
             db_path: Optional[str] = None,
             filter_in: Optional[Callable] = None):
    """The best archived transform for *einsum*, mapped onto *einsum*'s own
    names, ready to apply to its program (reference sql_utils.py:247-294:
    max summed GFLOP-rate, optional filter).  Re-timed copies of a config
    count as re-confirmations: ranking uses the config's lower-median rate
    (see :func:`aggregate_reconfirmations`), not its luckiest sample."""
    qs = query(einsum, device, db_path=db_path)
    if filter_in is not None:
        qs = [q for q in qs if filter_in(q)]
    if not qs:
        raise NoFactInDatabaseError("all facts rejected by filter_in")
    best = max(aggregate_reconfirmations(qs),
               key=lambda q: q.total_giga_op_rate)
    return best.transform


def record_facts(einsum: BatchedEinsum, *, transform_id: str,
                 transform_params: dict, runtime_in_sec: Optional[float],
                 device=None, db_path: Optional[str] = None,
                 long_dim_length: int = 100_000,
                 timeit_kwargs: Optional[dict] = None) -> None:
    """INSERT a timing fact (re-timing first when *runtime_in_sec* is None,
    matching reference record_facts, sql_utils.py:418-509)."""
    from datetime import datetime, timezone

    if db_path is None:
        db_path = DEFAULT_DB
    e = canonicalize_einsum(einsum)
    if runtime_in_sec is None:
        from .measure import timeit
        from .tuning import get_transform_func_from_module_path
        pt = get_transform_func_from_module_path(transform_id)
        transform = pt.bind_args(e, **transform_params)
        runtime_in_sec = timeit(e, transform=transform,
                                long_dim_length=long_dim_length,
                                **(timeit_kwargs or {}))
    conn = _connect(db_path)
    try:
        conn.execute(
            f"INSERT INTO {TIMINGS_TABLENAME} VALUES"
            f" (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (e.get_subscripts(), dump_index_to_length(e), dump_arg_names(e),
             dump_arg_to_dtype(e), get_device_key(device), transform_id,
             json.dumps(transform_params, sort_keys=True,
                        default=_jsonify),
             float(runtime_in_sec), dump_compiler_version(),
             dump_op_info(e, long_dim_length),
             datetime.now(timezone.utc).isoformat()))
        conn.commit()
    finally:
        conn.close()


def _jsonify(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, tuple):
        return list(v)
    raise TypeError(type(v))


def get_timed_einsums_in_db(db_path: Optional[str] = None,
                            device=None) -> list:
    """Reconstruct every distinct einsum recorded in the archive (reference
    sql_utils.py:342-386), asserting canonicalization soundness."""
    from .make_einsum import array, batched_einsum

    if db_path is None:
        db_path = DEFAULT_DB
    conn = _connect(db_path)
    try:
        where = ""
        params: tuple = ()
        if device is not None:
            where = " WHERE device_name = ?"
            params = (get_device_key(device),)
        rows = conn.execute(
            f"SELECT DISTINCT subscripts, index_to_length, args,"
            f" arg_to_dtype FROM {TIMINGS_TABLENAME}{where}",
            params).fetchall()
    finally:
        conn.close()
    out = []
    for subscripts, idx_len_s, args_s, dtypes_s in rows:
        idx_len = json.loads(idx_len_s)
        arg_names = json.loads(args_s)
        dtypes = json.loads(dtypes_s)
        in_specs = [s.strip()
                    for s in subscripts.split("->")[0].split(",")]

        def length_of(ix):
            # indices absent from index_to_length are parametric
            return int(idx_len[ix]) if ix in idx_len else f"N{ix}_"

        args = [[array(name,
                       [length_of(ix) for ix in in_specs[j]],
                       dtypes[name])
                 for j, name in enumerate(row)]
                for row in arg_names]
        e = canonicalize_einsum(batched_einsum(subscripts, args))
        # canonicalization soundness: the canonical form must reproduce the
        # stored key columns (reference sql_utils.py:342-386)
        assert e.get_subscripts() == subscripts
        assert dump_index_to_length(e) == idx_len_s
        assert dump_arg_names(e) == args_s
        assert dump_arg_to_dtype(e) == dtypes_s
        out.append(e)
    return out


def record_into_db(*args, **kwargs) -> None:
    """Deprecated alias of :func:`record_facts` (reference
    sql_utils.py:512-530)."""
    from warnings import warn
    warn("record_into_db is deprecated; use record_facts",
         DeprecationWarning, stacklevel=2)
    record_facts(*args, **kwargs)


def apply_best_transform(einsum: BatchedEinsum, device=None, *,
                         db_path: Optional[str] = None):
    """Convenience consumer path: look up the archive and return the
    transformed, compiled-on-first-call program for *einsum*."""
    from .codegen.program import generate_program
    transform = retrieve(einsum, device, db_path=db_path)
    return transform(generate_program(einsum))
