"""Serialized-executable cache (utils/exec_cache) unit coverage.

The cache exists because XLA's persistent-cache keys are unstable across
processes for the Pallas-bearing phase functions on the axon backend
(r3 finding); these tests pin the cache's own contract on the CPU
backend: deterministic keys, disk round-trip, graceful fallbacks.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recmv_tpu.utils.exec_cache import LazyAot, aot_compile, cache_key


def _fn(x, y):
    return {"dot": x @ y, "s": jnp.sum(x) * 2.0}


class TestExecCache:
    def test_cache_key_deterministic(self):
        j = jax.jit(_fn)
        a = np.ones((8, 8), np.float32)
        k1 = cache_key(j.lower(a, a), "t")
        k2 = cache_key(jax.jit(_fn).lower(a, a), "t")
        assert k1 == k2
        # different shapes → different key
        b = np.ones((16, 8), np.float32)
        assert cache_key(j.lower(b, a.T @ np.ones((8, 8), np.float32)), "t") != k1

    def test_roundtrip_and_reload(self, tmp_path):
        cd = str(tmp_path / "exec")
        j = jax.jit(_fn)
        a = np.full((8, 8), 2.0, np.float32)
        c1 = aot_compile(j, (a, a), cd, tag="unit")
        out1 = c1(a, a)
        files = [f for f in os.listdir(cd) if f.endswith(".jexec")]
        assert len(files) == 1
        # second compile loads from disk (deserialize path)
        c2 = aot_compile(jax.jit(_fn), (a, a), cd, tag="unit")
        out2 = c2(a, a)
        np.testing.assert_allclose(np.asarray(out1["dot"]),
                                   np.asarray(out2["dot"]))
        np.testing.assert_allclose(float(out1["s"]), float(out2["s"]))

    def test_lazy_aot_call_and_fallback(self, tmp_path):
        cd = str(tmp_path / "exec")
        la = LazyAot(jax.jit(_fn), cd, tag="lazy")
        a = np.ones((4, 4), np.float32)
        out = la(a, a)
        assert float(out["s"]) == 32.0
        # pinned executable serves repeat calls
        out = la(a, a)
        assert float(out["s"]) == 32.0
        # shape drift falls back to the plain jit path instead of raising
        b = np.ones((6, 6), np.float32)
        out = la(b, b)
        assert float(out["s"]) == 72.0

    def test_corrupt_cache_file_recompiles(self, tmp_path):
        cd = str(tmp_path / "exec")
        j = jax.jit(_fn)
        a = np.ones((8, 8), np.float32)
        aot_compile(j, (a, a), cd, tag="bad")
        (fname,) = [f for f in os.listdir(cd) if f.endswith(".jexec")]
        with open(os.path.join(cd, fname), "wb") as fh:
            fh.write(b"garbage")
        c = aot_compile(jax.jit(_fn), (a, a), cd, tag="bad")
        assert float(c(a, a)["s"]) == 128.0

    def test_alias_sidecar_speculative_load(self, tmp_path):
        cd = str(tmp_path / "exec")
        a = np.full((8, 8), 3.0, np.float32)
        aot_compile(jax.jit(_fn), (a, a), cd, tag="al")
        aliases = [f for f in os.listdir(cd) if f.endswith(".alias")]
        jexecs = [f for f in os.listdir(cd) if f.endswith(".jexec")]
        # fresh compile writes the sidecar pointing at its own payload
        assert len(aliases) == 1 and len(jexecs) == 1
        with open(os.path.join(cd, aliases[0])) as fh:
            assert fh.read().strip() == jexecs[0]
        # warm process: the alias-hinted speculative load must return the
        # correct executable (content key confirms the hint)
        c = aot_compile(jax.jit(_fn), (a, a), cd, tag="al")
        np.testing.assert_allclose(np.asarray(c(a, a)["dot"]),
                                   np.asarray(a @ a))

    def test_alias_mismatch_falls_through(self, tmp_path):
        # an alias pointing at a DIFFERENT content key (stale hint) must
        # not be trusted: the authoritative path recompiles/loads by key
        cd = str(tmp_path / "exec")
        a = np.full((8, 8), 1.0, np.float32)
        aot_compile(jax.jit(_fn), (a, a), cd, tag="mm")
        (alias,) = [f for f in os.listdir(cd) if f.endswith(".alias")]
        with open(os.path.join(cd, alias), "w") as fh:
            fh.write("mm-doesnotexist.jexec")  # dangling hint: skipped
        c = aot_compile(jax.jit(_fn), (a, a), cd, tag="mm")
        assert float(c(a, a)["s"]) == 128.0
        # a hint at a real but WRONG payload is ignored by key mismatch
        def _fn2(x, y):
            return {"dot": x @ y, "s": jnp.sum(x) * 4.0}
        aot_compile(jax.jit(_fn2), (a, a), cd, tag="mm2")
        (wrong,) = [f for f in os.listdir(cd)
                    if f.endswith(".jexec") and f.startswith("mm2")]
        with open(os.path.join(cd, alias), "w") as fh:
            fh.write(wrong)
        c = aot_compile(jax.jit(_fn), (a, a), cd, tag="mm")
        assert float(c(a, a)["s"]) == 128.0  # not _fn2's 256

    def test_train_config_env_default(self, monkeypatch, tmp_path):
        from recmv_tpu.core.network import TrainConfig

        monkeypatch.delenv("RECMV_EXEC_CACHE", raising=False)
        assert TrainConfig().exec_cache_dir is None
        monkeypatch.setenv("RECMV_EXEC_CACHE", str(tmp_path))
        assert TrainConfig().exec_cache_dir == str(tmp_path)
