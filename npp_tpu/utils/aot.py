"""AOT executable cache: serialize compiled TPU programs to disk and load
them in later sessions, skipping the 2-7 min remote compile behind the
relay tunnel.

Context (CLAUDE.md): the jax *persistent compilation cache* wedges on the
relay and is disabled there. Executable pickling
(jax.experimental.serialize_executable) was measured round-3 to WORK
through the relay: flagship fit-block payload 671 MB, serialize 43 s
(overlapped in a background thread), deserialize+first-run 24 s vs 180 s
cold compile — 7.6x on program acquisition, bit-identical outputs
(scripts/ab_aot_serialize.py; numbers in BASELINE.md).

Usage:
    fn = aot_cached(jax.jit(f), name='fit_block', cache_dir=dir,
                    cfg=cfg, extra=closure_digest_bytes)
    fn(*args)   # first call: load from cache or lower+compile+save

The cache key covers everything that determines the compiled program:
argument avals (shape/dtype/tree), the config, the npp_tpu source digest,
jax/jaxlib versions, backend platform + device kind + device count, and
caller-supplied `extra` bytes for data CLOSED OVER by the traced function
(per-image constants in the sequential fit path; the batched path passes
its data as arguments and needs none). A stale or foreign entry therefore
simply misses; a corrupt entry falls back to the normal jit path.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import pickle
import sys
import threading
import time
from typing import Any, Callable, Optional

import jax
import numpy as np

_SRC_DIGEST: Optional[str] = None


def _source_digest() -> str:
    """Content hash of every .py file in the npp_tpu package (computed once
    per process): any code change invalidates the cache."""
    global _SRC_DIGEST
    if _SRC_DIGEST is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for root, _, files in sorted(os.walk(pkg)):
            for f in sorted(files):
                if f.endswith('.py'):
                    p = os.path.join(root, f)
                    # package-relative path: an absolute path would key the
                    # cache on the checkout location and a moved/renamed
                    # repo would silently miss every entry
                    h.update(os.path.relpath(p, pkg).encode())
                    with open(p, 'rb') as fh:
                        h.update(fh.read())
        _SRC_DIGEST = h.hexdigest()
    return _SRC_DIGEST


def digest_arrays(tree) -> bytes:
    """Digest of concrete array VALUES in a pytree — for data the traced
    function closes over (it is baked into the executable as constants)."""
    h = hashlib.sha256()
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        h.update(str(path).encode())
        a = np.asarray(leaf)
        h.update(str((a.shape, str(a.dtype))).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.digest()


def _aval_sig(args) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = [f"{getattr(l, 'shape', ())}/{getattr(l, 'dtype', type(l).__name__)}"
           for l in leaves]
    return str(treedef) + '|' + ';'.join(map(str, sig))


# config fields that never shape a compiled program (paths / run labels):
# excluding them lets images that differ only by location share one entry
_NON_SEMANTIC_CFG = frozenset(
    {'datadir', 'outdir', 'basedir', 'expname', 'aot_cache_dir'})


def _cfg_sig(cfg) -> str:
    if cfg is None:
        return ''
    if dataclasses.is_dataclass(cfg):
        d = dataclasses.asdict(cfg)
    elif isinstance(cfg, dict):
        d = dict(cfg)
    else:
        d = {'repr': repr(cfg)}
    for k in _NON_SEMANTIC_CFG:
        d.pop(k, None)
    return json.dumps(d, sort_keys=True, default=repr)


def _backend_sig() -> str:
    dev = jax.devices()[0]
    return f"{dev.platform}/{dev.device_kind}/{jax.device_count()}/" \
           f"jax{jax.__version__}"


class _AotWrapped:
    """Callable wrapping a jitted function with a disk executable cache.
    Resolution happens at the first call (when concrete args pin the
    avals); later calls go straight to the resolved executable."""

    def __init__(self, jitfn, name: str, cache_dir: str, cfg=None,
                 extra: bytes = b'', save: bool = True,
                 log: Callable[[str], None] = lambda m: print(
                     m, file=sys.stderr, flush=True)):
        self._jitfn = jitfn
        self._name = name
        self._dir = cache_dir
        self._cfg = cfg
        self._extra = extra
        self._save = save
        self._log = log
        # one resolved executable PER argument-aval signature: jit retraces
        # on new shapes/dtypes and the wrapper must do the same (a single
        # pinned executable would raise an opaque XLA input-mismatch error
        # on the second shape)
        self._fns: dict = {}
        self._lock = threading.Lock()

    # expose the underlying jit handle (e.g. for .lower diagnostics)
    @property
    def jitfn(self):
        return self._jitfn

    def _key(self, args) -> str:
        h = hashlib.sha256()
        for part in (self._name, _backend_sig(), _source_digest(),
                     _cfg_sig(self._cfg), _aval_sig(args)):
            h.update(part.encode())
        h.update(self._extra)
        return h.hexdigest()[:32]

    def _resolve(self, args):
        from jax.experimental import serialize_executable as se
        os.makedirs(self._dir, exist_ok=True)
        path = os.path.join(self._dir, f'{self._name}-{self._key(args)}.aot')
        if os.path.exists(path):
            try:
                t0 = time.time()
                with open(path, 'rb') as f:
                    payload, in_tree, out_tree, dev_ids = pickle.load(f)
                by_id = {d.id: d for d in jax.devices()}
                fn = se.deserialize_and_load(
                    payload, in_tree, out_tree,
                    execution_devices=[by_id[i] for i in dev_ids])
                self._log(f'[aot] loaded {os.path.basename(path)} '
                          f'({time.time() - t0:.1f}s)')
                return fn
            except Exception as e:
                self._log(f'[aot] load failed ({e!r}); recompiling')
        t0 = time.time()
        compiled = self._jitfn.lower(*args).compile()
        self._log(f'[aot] compiled {self._name} ({time.time() - t0:.1f}s)')
        if self._save:
            # the executable's device assignment must be reproduced at
            # load time (deserialize defaults to ALL local devices, which
            # breaks single-device programs on a multi-device host)
            try:
                dev_ids = [d.id for d in compiled._executable.local_devices()]
            except Exception:
                dev_ids = [jax.devices()[0].id]

            def persist():
                try:
                    payload, in_tree, out_tree = se.serialize(compiled)
                    tmp = f'{path}.tmp.{os.getpid()}'
                    with open(tmp, 'wb') as f:
                        pickle.dump((payload, in_tree, out_tree, dev_ids), f)
                    os.replace(tmp, path)
                    self._log(f'[aot] saved {os.path.basename(path)} '
                              f'({len(payload) / 1e6:.0f} MB)')
                except Exception as e:
                    self._log(f'[aot] save failed ({e!r})')
            if os.environ.get('NPP_TPU_AOT_SYNC'):
                persist()   # deterministic save for tests
            else:
                # serialize costs ~40 s for the flagship block through the
                # relay — overlap it with the ongoing fit
                threading.Thread(target=persist, daemon=True).start()
        return compiled

    def __call__(self, *args):
        sig = _aval_sig(args)
        fn = self._fns.get(sig)
        if fn is None:
            with self._lock:
                fn = self._fns.get(sig)
                if fn is None:
                    fn = self._resolve(args)
                    self._fns[sig] = fn
        return fn(*args)

    def warm(self, *args) -> bool:
        """Compile (or load) + persist the executable for these argument
        AVALS without executing it — args may be jax.ShapeDtypeStruct trees
        (scripts/warm_aot.py pre-compiles a suite's shape classes so a cold
        session pays seconds, not 2-7 min relay compiles, per program).
        Returns True when the entry already existed on disk."""
        sig = _aval_sig(args)
        with self._lock:
            if sig in self._fns:
                return True
            path = os.path.join(self._dir,
                                f'{self._name}-{self._key(args)}.aot')
            existed = os.path.exists(path)
            self._fns[sig] = self._resolve(args)
            return existed


def cache_dir_from(cfg) -> Optional[str]:
    """Resolve the configured cache directory: cfg.aot_cache_dir, else the
    NPP_TPU_AOT_CACHE environment variable, else None (feature off)."""
    return getattr(cfg, 'aot_cache_dir', '') or \
        os.environ.get('NPP_TPU_AOT_CACHE') or None


def aot_cached(jitfn, name: str, cache_dir: Optional[str], cfg=None,
               extra: bytes = b'', save: bool = True):
    """Wrap `jitfn` with the executable cache; cache_dir=None returns the
    jit function unchanged (feature off)."""
    if not cache_dir:
        return jitfn
    return _AotWrapped(jitfn, name, cache_dir, cfg=cfg, extra=extra,
                       save=save)
