"""Persistent ahead-of-time executable cache.

XLA's own persistent compilation cache computes unstable keys for the
Pallas-bearing phase functions across processes on the axon TPU backend
(observed r3: ``main_fn`` hits, ``fl``/``pc``/``rays`` always miss even
though their StableHLO is byte-identical), so every new training process
pays the full ~10-minute compile chain. This module sidesteps XLA's key
machinery entirely: we key on the SHA-256 of the *lowered StableHLO
bytecode* (deterministic across processes) plus the jax version and
device kind, and persist the compiled executable itself via
``jax.experimental.serialize_executable``.

A cache hit turns a multi-minute phase compile into a sub-second
deserialize. Anything that fails (serialization unsupported on a
backend, stale jax version, corrupt file) falls back to a normal
compile — the cache is strictly advisory.

Wired in via ``LazyAot`` wrappers around the per-phase ``jax.jit``
functions (core/network.py:_get_jitted) and the seg3d extract functions;
enable by setting ``TrainConfig.exec_cache_dir`` or the
``RECMV_EXEC_CACHE`` environment variable.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys


def _canonicalize_mosaic_payloads(asm: str) -> str:
    """Replace each Pallas/Mosaic kernel payload with its location-free
    reprint.

    ``tpu_custom_call`` backend_configs embed the Mosaic kernel module as
    base64 MLIR bytecode INCLUDING debug locations — and those locations
    name the *caller* that first lowered the (process-wide cached)
    kernel. When several phase functions share a kernel and are lowered
    concurrently (warm_start threads), whichever wins the race stamps
    its call stack into every consumer's StableHLO, making the bytes —
    and therefore both this cache's keys and XLA's persistent-cache
    keys — nondeterministic across processes (observed r3: ~600 B of
    tail metadata differing in 182 MB modules). Decoding each payload
    and reprinting it without debug info restores a content-only key."""
    import base64
    import re

    from jax._src.lib.mlir import ir

    pat = re.compile(r'(body\\22: \\22)([A-Za-z0-9+/=]+)(\\22)')

    def repl(m):
        try:
            raw = base64.b64decode(m.group(2))
            with ir.Context() as ctx:
                ctx.allow_unregistered_dialects = True
                mod = ir.Module.parse(raw)
                canon = mod.operation.get_asm(enable_debug_info=False)
            digest = hashlib.sha256(canon.encode()).hexdigest()
            return m.group(1) + digest + m.group(3)
        except Exception:
            return m.group(0)

    return pat.sub(repl, asm)


def _module_bytes(lowered) -> bytes:
    """Deterministic bytes of a ``jax.stages.Lowered``'s StableHLO:
    debug-info-free ASM with Mosaic kernel payloads canonicalized (see
    :func:`_canonicalize_mosaic_payloads`)."""
    try:
        ir_mod = lowered.compiler_ir("stablehlo")
        asm = ir_mod.operation.get_asm(enable_debug_info=False)
        if "tpu_custom_call" in asm:
            asm = _canonicalize_mosaic_payloads(asm)
        return asm.encode()
    except Exception:
        try:
            from jax._src.interpreters import mlir

            return mlir.module_to_bytecode(lowered.compiler_ir("stablehlo"))
        except Exception:
            return lowered.as_text().encode()


def cache_key(lowered, tag: str = "") -> str:
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    dev = jax.devices()[0]
    h.update(f"{dev.platform}/{getattr(dev, 'device_kind', '?')}".encode())
    h.update(tag.encode())
    h.update(_module_bytes(lowered))
    return h.hexdigest()[:32]


def _log(msg: str):
    sys.stderr.write(f"[exec_cache] {msg}\n")
    sys.stderr.flush()


def cache_enabled() -> bool:
    """True when the serialized-executable cache is safe to use.

    XLA:CPU AOT results embed the *compile-time host's* machine features
    and can fail (or SIGILL) when loaded by a later process (observed:
    'Buffer Definition Event: Function ... not found' + a machine-feature
    mismatch warning), so the cache is TPU-only unless
    ``RECMV_EXEC_CACHE_CPU=1`` explicitly opts CPU in (tests)."""
    if os.environ.get("RECMV_EXEC_CACHE_CPU") == "1":
        return True
    import jax

    return jax.devices()[0].platform in ("tpu", "axon")


def _source_tree_hash() -> str:
    """Hash of every .py file in the recmv_tpu package (content only,
    sorted relative paths) — a fast, conservative fingerprint for the
    speculative-load alias key. Computed once per process."""
    global _SRC_HASH
    if _SRC_HASH is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(os.path.relpath(p, root).encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        _SRC_HASH = h.hexdigest()
    return _SRC_HASH


_SRC_HASH = None


def _alias_key(args, tag: str) -> str:
    """Cheap (milliseconds) signature of an aot_compile call: arg
    shapes/dtypes + pytree structure + source tree + jax/device. NOT
    value-complete (baked-in constants — templates, loss weights from
    the conf — are invisible to it), so it only ever *hints* which
    executable the authoritative content key will select; see
    aot_compile's speculative load."""
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    dev = jax.devices()[0]
    h.update(f"{dev.platform}/{getattr(dev, 'device_kind', '?')}".encode())
    h.update(tag.encode())
    h.update(_source_tree_hash().encode())
    leaves, treedef = jax.tree_util.tree_flatten(args)
    h.update(str(treedef).encode())
    for l in leaves:
        h.update(f"{getattr(l, 'shape', ())}/{getattr(l, 'dtype', type(l))};".encode())
    return h.hexdigest()[:32]


def _load_exec(path: str, validate_args=None):
    """pickle → deserialize_and_load (→ optional one-shot validation)."""
    import jax
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as fh:
        n_devs, payload, in_tree, out_tree = pickle.load(fh)
    devs = jax.local_devices()[:n_devs] if n_devs else None
    out = se.deserialize_and_load(payload, in_tree, out_tree,
                                  execution_devices=devs)
    if validate_args is not None:
        # validate by executing once (phase fns are pure): stale
        # machine-feature/fusion mismatches only surface at run time
        jax.block_until_ready(out(*validate_args))
    return out


def aot_compile(jitted, args, cache_dir: str | None, tag: str = ""):
    """``jitted.lower(*args).compile()`` with a disk round-trip.

    Returns a ``jax.stages.Compiled`` (or loaded equivalent). With
    ``cache_dir=None`` this is a plain AOT compile.

    Warm-start latency: lowering a production fused step costs ~65 s and
    deserializing its 1.6 GB executable ~80 s — run serially that is the
    whole warm_start budget (VERDICT r3 #8). An ``.alias`` sidecar maps a
    cheap signature (shapes/source-tree, :func:`_alias_key`) to the last
    content key it resolved to, so the expected executable can start
    deserializing in a background thread WHILE the main thread lowers and
    computes the authoritative content key; the speculative result is
    only used if the content key confirms it. The content key stays the
    sole authority — an alias hit never skips it.
    """
    import threading
    import time

    alias_path = spec = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        try:
            akey = _alias_key(args, tag)
            alias_path = os.path.join(cache_dir, f"{tag or 'fn'}-{akey}.alias")
            if os.path.isfile(alias_path):
                with open(alias_path) as fh:
                    hinted = fh.read().strip()
                hinted_path = os.path.join(cache_dir, hinted)
                if os.path.isfile(hinted_path) and os.path.basename(hinted) == hinted:
                    spec = {"path": hinted_path, "out": None, "err": None}

                    def _spec_load():
                        try:
                            spec["out"] = _load_exec(spec["path"])
                        except Exception as e:  # noqa: BLE001
                            spec["err"] = e

                    spec["thread"] = threading.Thread(target=_spec_load,
                                                      daemon=True)
                    spec["t0"] = time.time()
                    spec["thread"].start()
        except Exception as e:  # alias machinery is strictly advisory
            _log(f"{tag}: alias probe failed ({type(e).__name__}: {e})")
            spec = None

    t0 = time.time()
    lowered = jitted.lower(*args)
    t_lower = time.time() - t0
    if not cache_dir:
        return lowered.compile()
    t0 = time.time()
    key = cache_key(lowered, tag)
    t_key = time.time() - t0
    if t_lower + t_key > 5:
        _log(f"{tag}: lower {t_lower:.1f}s key {t_key:.1f}s")
    fname = f"{tag or 'fn'}-{key}.jexec"
    path = os.path.join(cache_dir, fname)

    def _write_alias():
        if alias_path:
            try:
                tmp = f"{alias_path}.tmp{os.getpid()}"
                with open(tmp, "w") as fh:
                    fh.write(fname)
                os.replace(tmp, alias_path)
            except Exception:
                pass

    if spec is not None and spec["path"] == path:
        import jax

        spec["thread"].join()
        if spec["err"] is None:
            try:
                jax.block_until_ready(spec["out"](*args))
                _log(f"{tag}: loaded in {time.time()-spec['t0']:.1f}s "
                     f"(speculative, {path})")
                return spec["out"]
            except Exception as e:
                _log(f"{tag}: speculative validate failed "
                     f"({type(e).__name__}: {e}); recompiling")
        else:
            _log(f"{tag}: speculative load failed "
                 f"({type(spec['err']).__name__}: {spec['err']}); retrying")
    elif spec is not None:
        # alias pointed at a different content key (constants changed
        # without a source/shape change, e.g. new conf weights): let the
        # wasted thread finish in the background, take the normal path
        _log(f"{tag}: alias mismatch (hint {os.path.basename(spec['path'])} "
             f"vs {fname})")

    if os.path.isfile(path):
        try:
            t0 = time.time()
            out = _load_exec(path, validate_args=args)
            _log(f"{tag}: loaded in {time.time()-t0:.1f}s ({path})")
            _write_alias()
            return out
        except Exception as e:  # corrupt/incompatible: recompile
            _log(f"{tag}: load failed ({type(e).__name__}: {e}); recompiling")
    t0 = time.time()
    compiled = lowered.compile()
    dt = time.time() - t0
    try:
        from jax.experimental import serialize_executable as se

        try:  # executables are pinned to their compile-time device set
            n_devs = len(compiled._executable.xla_executable.local_devices())
        except Exception:
            n_devs = 0
        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump((n_devs, payload, in_tree, out_tree), fh)
        os.replace(tmp, path)
        _write_alias()
        _log(f"{tag}: compiled in {dt:.1f}s, cached {len(payload)>>20} MiB")
    except Exception as e:  # serialization unsupported: still return compiled
        _log(f"{tag}: compiled in {dt:.1f}s, serialize failed "
             f"({type(e).__name__}: {e})")
    return compiled


class LazyAot:
    """Callable wrapping a ``jax.jit`` function: first call AOT-compiles
    through :func:`aot_compile` (disk cache), later calls hit the pinned
    executable. Falls back to the plain jitted function if the pinned
    executable rejects an argument structure (shape drift within a mesh
    era should not happen; this keeps it from ever being fatal)."""

    def __init__(self, jitted, cache_dir: str | None, tag: str = ""):
        self._jitted = jitted
        self._cache_dir = cache_dir
        self._tag = tag
        self._compiled = None

    def warm(self, *args):
        """AOT-compile (or load) for these example args."""
        if self._compiled is None:
            self._compiled = aot_compile(self._jitted, args,
                                         self._cache_dir, self._tag)
        return self

    def lower(self, *args):
        return self._jitted.lower(*args)

    def __call__(self, *args):
        if self._compiled is None:
            try:
                self.warm(*args)
            except Exception as e:  # lowering quirk: plain jit path
                _log(f"{self._tag}: aot failed ({type(e).__name__}: {e}); "
                     f"using plain jit")
                self._compiled = self._jitted
        try:
            return self._compiled(*args)
        except TypeError:
            return self._jitted(*args)
