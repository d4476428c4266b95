"""Compile-warmup record/replay: AOT-compile the pipeline's programs
off the critical path.

A fresh process pays trace + lower + persistent-cache-load serially for
every XLA program the pipeline touches (~150 programs for a 2 Mb `all`
run; measured ~20 s of the fresh-vs-steady wall-clock gap on the
tunneled v5e).  The reference binary pays nothing — it is compiled ahead
of time (standardPregraph/main.c:117 dispatches straight into compiled
stages) — and production TPU serving likewise warms executables before
taking traffic.

Mechanism: once per (cmd, K, batch, z, ...) configuration, a recording
run wraps every module-level jitted kernel and captures the concrete
argument specs (shapes/dtypes/weak-types for array leaves, literals for
the rest, container structure preserved via the registered pytrees) in
first-call order.  Later runs replay ``fn.lower(spec).compile()`` for
every entry in a background thread pool started at CLI entry: tracing,
lowering and compile-cache loads all happen concurrently with stage IO,
and ``jax.jit``'s dispatch cache is pre-populated (an AOT ``lower() ->
compile()`` shares the in-memory executable cache with the normal call
path, verified empirically), so the pipeline's first real call costs
~1 ms instead of 0.1-25 s.

A stale or missing manifest is harmless: replay failures are swallowed
(the program just compiles at normal cost when the pipeline reaches it),
and a recording with different data merely warms unused shapes.
"""

from __future__ import annotations

import concurrent.futures as _cf
import logging
import os
import pickle
import threading
from typing import Any, Dict, List, Optional, Tuple

log = logging.getLogger("soapdenovo2_tpu.warmup")

# model/op modules whose module-level jitted kernels are warmable; the
# parallel/* shard kernels are per-mesh closures and are excluded (multi
# -chip runs amortize compiles across far longer wall-clocks)
_MOD_NAMES = [
    "soapdenovo2_tpu.ops.kmer",
    "soapdenovo2_tpu.ops.sortcount",
    "soapdenovo2_tpu.ops.chains",
    "soapdenovo2_tpu.ops.align",
    "soapdenovo2_tpu.ops.localasm",
    "soapdenovo2_tpu.models.pregraph",
    "soapdenovo2_tpu.models.edges",
    "soapdenovo2_tpu.models.kmer_graph",
    "soapdenovo2_tpu.models.mapping",
    "soapdenovo2_tpu.models.contig",
    "soapdenovo2_tpu.models.scaffold",
    "soapdenovo2_tpu.models.gapfill",
    "soapdenovo2_tpu.models.sparse",
    "soapdenovo2_tpu.models.iterate",
]


class _ArrSpec:
    """Atomic (non-pytree) placeholder for an array leaf."""

    __slots__ = ("shape", "dtype", "weak")

    def __init__(self, shape, dtype, weak):
        self.shape = tuple(int(s) for s in shape)
        self.dtype = str(dtype)
        self.weak = bool(weak)

    def __getstate__(self):
        return (self.shape, self.dtype, self.weak)

    def __setstate__(self, st):
        self.shape, self.dtype, self.weak = st


class _Lit:
    """Atomic placeholder for a non-array leaf (static/python scalar)."""

    __slots__ = ("val",)

    def __init__(self, val):
        self.val = val

    def __getstate__(self):
        return (self.val,)

    def __setstate__(self, st):
        (self.val,) = st


def _leaf_spec(leaf):
    import jax
    import numpy as np

    if isinstance(leaf, jax.Array):
        return _ArrSpec(leaf.shape, leaf.dtype, leaf.aval.weak_type)
    if isinstance(leaf, np.ndarray):
        return _ArrSpec(leaf.shape, leaf.dtype, False)
    if isinstance(leaf, np.generic):
        return _ArrSpec((), leaf.dtype, False)
    return _Lit(leaf)


def _spec_tree(args: tuple, kwargs: dict):
    import jax

    return jax.tree.map(_leaf_spec, (args, kwargs))


def _materialize(spec_tree):
    import jax

    def back(s):
        if isinstance(s, _ArrSpec):
            return jax.ShapeDtypeStruct(s.shape, s.dtype, weak_type=s.weak)
        if isinstance(s, _Lit):
            return s.val
        return s

    return jax.tree.map(
        back, spec_tree,
        is_leaf=lambda x: isinstance(x, (_ArrSpec, _Lit)),
    )


def _pjit_type():
    import jax

    return type(jax.jit(lambda: 0))


def _scan_registry() -> Dict[str, Any]:
    """name -> module-level jitted fn, importing the warmable modules."""
    import importlib

    t = _pjit_type()
    reg: Dict[str, Any] = {}
    for mname in _MOD_NAMES:
        try:
            mod = importlib.import_module(mname)
        except Exception:  # noqa: BLE001 — a missing optional module
            continue
        for attr, v in list(vars(mod).items()):
            if isinstance(v, (_Recorder, _AotProxy)):
                v = v._fn
            if isinstance(v, t):
                reg[f"{mname}.{attr}"] = v
    return reg


# ---------------------------------------------------------------- record

class _Recorder:
    """Transparent wrapper over a jitted fn that records call specs."""

    def __init__(self, fn, name: str, sink: "_Session"):
        self._fn = fn
        self._name = name
        self._sink = sink

    def __call__(self, *args, **kwargs):
        try:
            self._sink.add(self._name, args, kwargs)
        except Exception:  # noqa: BLE001 — recording must never break a run
            pass
        return self._fn(*args, **kwargs)

    def __getattr__(self, item):
        return getattr(self._fn, item)


class _Session:
    def __init__(self):
        import time

        self.entries: List[Tuple[str, Any, float]] = []
        self._seen = set()
        self._lock = threading.Lock()
        self._t0 = time.time()

    def add(self, name: str, args, kwargs):
        import time

        spec = _spec_tree(args, kwargs)
        key = (name, pickle.dumps(spec))
        with self._lock:
            if key in self._seen:
                return
            self._seen.add(key)
            self.entries.append((name, spec, time.time() - self._t0))


_session: Optional[_Session] = None
_replay_pool: Optional[_cf.ThreadPoolExecutor] = None


# ------------------------------------------------------------- AOT mode
#
# The thread-pool replay still pays full TRACING on this host's GIL —
# ~35 s of background CPU squeezed into the pipeline's first seconds,
# which contends with the count pass's decode/pack loop.  AOT mode skips
# tracing entirely: the recording run serializes every compiled
# executable (jax.experimental.serialize_executable) into `<key>.aot`
# beside the manifest, and replay installs dispatch proxies over the
# module-level jitted fns — a call whose arg spec matches a stored entry
# goes straight to the deserialized executable (no trace, no lower, no
# compile); anything else falls through to the normal jit path.  This is
# the production-TPU analog of the reference binary being compiled ahead
# of time (main.c dispatches into precompiled stages).

def _aot_env_key() -> str:
    import jax

    dev = jax.devices()[0]
    return f"{jax.__version__}|{jax.default_backend()}|{dev.device_kind}"


class _AotProxy:
    """Dispatch wrapper over a jitted fn with a spec->executable table."""

    def __init__(self, fn, table: Dict[bytes, Any]):
        self._fn = fn
        self._table = table

    def __call__(self, *args, **kwargs):
        try:
            import jax

            leaves = jax.tree_util.tree_leaves((args, kwargs))
            for leaf in leaves:
                if isinstance(leaf, jax.core.Tracer):
                    raise _FallThrough  # under trace: use the jit path
            key = pickle.dumps(_spec_tree(args, kwargs))
            compiled = self._table.get(key)
            if compiled is not None:
                return compiled(*args, **kwargs)
        except _FallThrough:
            pass
        except Exception:  # noqa: BLE001 — any mismatch: normal path
            pass
        return self._fn(*args, **kwargs)

    def __getattr__(self, item):
        return getattr(self._fn, item)


class _FallThrough(Exception):
    pass


def _aot_save(path: str, entries) -> None:
    """Compile + serialize every recorded entry into one bundle."""
    import jax
    from jax.experimental import serialize_executable as se

    reg = _scan_registry()
    bundle = {"env": _aot_env_key(), "items": []}
    for name, spec, t in entries:
        fn = reg.get(name)
        if fn is None:
            continue
        try:
            args, kwargs = _materialize(spec)
            compiled = fn.lower(*args, **kwargs).compile()
            payload, in_tree, out_tree = se.serialize(compiled)
            bundle["items"].append(
                (name, pickle.dumps(spec), payload,
                 pickle.dumps(in_tree), pickle.dumps(out_tree), t))
        except Exception as exc:  # noqa: BLE001 — skip unserializable
            log.debug("aot skip %s: %s", name, str(exc)[:120])
    with open(path, "wb") as f:
        pickle.dump(bundle, f)
    log.info("warmup: AOT bundle %d executables -> %s",
             len(bundle["items"]), path)


def _aot_load(path: str) -> bool:
    """Install AOT dispatch proxies; returns True when active."""
    import jax
    from jax.experimental import serialize_executable as se

    try:
        with open(path, "rb") as f:
            bundle = pickle.load(f)
        if bundle.get("env") != _aot_env_key():
            log.info("warmup: AOT bundle env mismatch; ignoring")
            return False
        reg = _scan_registry()
        import importlib

        tables: Dict[str, Dict[bytes, Any]] = {}
        n = 0
        for name, spec_b, payload, in_b, out_b, t in bundle["items"]:
            if name not in reg:
                continue
            try:
                compiled = se.deserialize_and_load(
                    payload, pickle.loads(in_b), pickle.loads(out_b))
                tables.setdefault(name, {})[spec_b] = compiled
                n += 1
            except Exception as exc:  # noqa: BLE001
                log.debug("aot load miss %s: %s", name, str(exc)[:120])
        for name, table in tables.items():
            mname, attr = name.rsplit(".", 1)
            mod = importlib.import_module(mname)
            setattr(mod, attr, _AotProxy(reg[name], table))
        log.info("warmup: %d AOT executables installed", n)
        return n > 0
    except Exception as exc:  # noqa: BLE001 — never fatal
        log.debug("warmup: AOT load failed: %s", exc)
        return False


def manifest_dir() -> str:
    d = os.environ.get("SOAP_WARMUP_DIR")
    if d:
        return d
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, ".jaxwarm")


def manifest_key(cmd: str, **params) -> str:
    import jax

    parts = [cmd] + [f"{k}{v}" for k, v in sorted(params.items())
                     if v not in (None, 0, False, "")]
    parts.append(jax.default_backend())
    return "-".join(str(p) for p in parts)


_replayed_keys = set()


def begin(key: str) -> None:
    """Start recording (SOAP_WARMUP_RECORD=1) or background replay."""
    global _session
    if key in _replayed_keys:
        return
    _replayed_keys.add(key)
    if os.environ.get("SOAP_WARMUP_RECORD") == "1":
        _session = _Session()
        reg = _scan_registry()
        import importlib

        for name, fn in reg.items():
            mname, attr = name.rsplit(".", 1)
            mod = importlib.import_module(mname)
            setattr(mod, attr, _Recorder(fn, name, _session))
        log.info("warmup: recording %d jitted kernels", len(reg))
        return
    aot_path = os.path.join(manifest_dir(), key + ".aot")
    if (os.path.exists(aot_path)
            and os.environ.get("SOAP_WARMUP_AOT", "1") == "1"):
        if _aot_load(aot_path):
            return
    path = os.path.join(manifest_dir(), key + ".pkl")
    if not os.path.exists(path):
        log.debug("warmup: no manifest %s", path)
        return
    t = threading.Thread(target=_replay, args=(path,), daemon=True)
    t.start()
    _replay_threads.append(t)


_replay_threads: List[threading.Thread] = []


def wait(timeout: Optional[float] = None) -> None:
    """Block until outstanding replay threads finish (e.g. a bench
    preparing a fully-warm process before its timed region)."""
    for t in list(_replay_threads):
        t.join(timeout)


def finish(key: str) -> None:
    """Save the recorded manifest (record mode only)."""
    global _session
    if _session is None:
        return
    os.makedirs(manifest_dir(), exist_ok=True)
    path = os.path.join(manifest_dir(), key + ".pkl")
    good = []
    for name, spec, t in _session.entries:
        try:
            pickle.dumps(spec)
            good.append((name, spec, t))
        except Exception:  # noqa: BLE001 — unpicklable statics are skipped
            pass
    with open(path, "wb") as f:
        pickle.dump({"version": 2, "entries": good}, f)
    log.info("warmup: saved %d entries -> %s", len(good), path)
    try:
        _aot_save(os.path.join(manifest_dir(), key + ".aot"), good)
    except Exception as exc:  # noqa: BLE001 — AOT bundle is optional
        log.warning("warmup: AOT save failed: %s", exc)
    _session = None


def _replay(path: str) -> None:
    try:
        with open(path, "rb") as f:
            data = pickle.load(f)
        entries = data["entries"]
        early: List[Any] = []
        if data.get("version", 1) >= 2:
            # programs the recording hit in its first seconds are the
            # ones the MAIN thread reaches almost immediately — flooding
            # the pool with them duplicates tracing and contends the GIL
            # against the count pass's decode loop.  They get ONE
            # dedicated in-order thread (still ahead of the main thread,
            # whose first seconds are native decode + upload); the
            # later-stage programs fan out over the pool.
            early = [e for e in entries if e[2] < 2.0]
            entries = [e for e in entries if e[2] >= 2.0]
        reg = _scan_registry()
        import time

        t0 = time.time()
        done = [0]

        def warm_one(item):
            name, spec = item[0], item[1]
            fn = reg.get(name)
            if fn is None:
                return
            try:
                args, kwargs = _materialize(spec)
                fn.lower(*args, **kwargs).compile()
                done[0] += 1
            except Exception as exc:  # noqa: BLE001 — stale spec: skip
                log.debug("warmup miss %s: %s", name, str(exc)[:120])

        early_t = None
        if early:
            early_t = threading.Thread(
                target=lambda: [warm_one(e) for e in early], daemon=True)
            early_t.start()
        # modest pool: tunnel compiles parallelize ~6x at 8 threads;
        # tracing contends on the GIL with the main pipeline thread
        with _cf.ThreadPoolExecutor(8) as pool:
            list(pool.map(warm_one, entries))
        if early_t is not None:
            early_t.join()
        log.info("warmup: %d/%d programs ready (%.1fs)",
                 done[0], len(entries), time.time() - t0)
    except Exception as exc:  # noqa: BLE001 — warmup is never fatal
        log.debug("warmup replay failed: %s", exc)
