import asyncio
import threading
import time

import numpy as np
import pytest
import requests

from apex_studio_tpu.server.stability import TokenBucket
from apex_studio_tpu.utils.disk_cache import EmbeddingCache, canonical_hash


class TestTokenBucket:
    def test_burst_then_limit(self):
        b = TokenBucket(rate=0.0, burst=3)
        assert [b.allow() for _ in range(4)] == [True, True, True, False]

    def test_refill(self):
        b = TokenBucket(rate=1000.0, burst=1)
        assert b.allow()
        assert not b.allow()
        time.sleep(0.01)
        assert b.allow()


class TestEmbeddingCache:
    def test_roundtrip(self, tmp_path):
        cache = EmbeddingCache("test", root=tmp_path)
        payload = {"prompts": ["hello"], "max_len": 64}
        assert cache.load(payload) is None
        a = np.random.default_rng(0).normal(size=(1, 8, 4)).astype(np.float32)
        m = np.ones((1, 8), np.int32)
        cache.store(payload, a, m)
        got = cache.load(payload)
        assert got is not None
        np.testing.assert_array_equal(got[0], a)
        np.testing.assert_array_equal(got[1], m)

    def test_key_sensitivity(self, tmp_path):
        cache = EmbeddingCache("test", root=tmp_path)
        cache.store({"p": "a"}, np.zeros((1,), np.float32))
        assert cache.load({"p": "b"}) is None

    def test_canonical_hash_order_invariant(self):
        assert canonical_hash({"a": 1, "b": 2}) == canonical_hash({"b": 2, "a": 1})

    def test_disable_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("APEX_DISABLE_EMBED_CACHE", "1")
        cache = EmbeddingCache("test", root=tmp_path)
        cache.store({"p": "x"}, np.zeros((1,), np.float32))
        assert cache.load({"p": "x"}) is None


class TestEncodeCaching:
    def test_second_encode_hits_cache(self, tmp_path, monkeypatch):
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path))
        import yaml

        from tests.test_engine_zimage import TINY_MANIFEST, make_tokenizer

        path = tmp_path / "m.yml"
        path.write_text(yaml.safe_dump(TINY_MANIFEST))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path)
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        eng.load_component_by_type("text_encoder")

        h1, m1 = eng.text_encoder.encode(["hello world"], max_sequence_length=32)
        # poison the jit cache to prove the second call doesn't run the model
        eng._jit_cache.clear()
        eng.text_encoder.model = None
        h2, m2 = eng.text_encoder.encode(["hello world"], max_sequence_length=32)
        np.testing.assert_allclose(
            np.asarray(h1, np.float32), np.asarray(h2, np.float32), atol=1e-6
        )


class TestStabilityMiddleware:
    def test_rate_limit_429(self, tmp_path):
        from aiohttp import web

        from apex_studio_tpu.server.stability import install_stability_middleware

        app = web.Application()

        async def ok(_):
            return web.json_response({"ok": True})

        app.router.add_get("/x", ok)
        install_stability_middleware(app, rate=0.0, burst=2)

        loop = asyncio.new_event_loop()
        started = threading.Event()
        bound = {}

        def run():
            asyncio.set_event_loop(loop)

            async def main():
                runner = web.AppRunner(app)
                await runner.setup()
                site = web.TCPSite(runner, "127.0.0.1", 0)
                await site.start()
                bound["port"] = site._server.sockets[0].getsockname()[1]
                started.set()
                while True:
                    await asyncio.sleep(3600)

            try:
                loop.run_until_complete(main())
            except Exception:
                pass

        threading.Thread(target=run, daemon=True).start()
        assert started.wait(10)
        base = f"http://127.0.0.1:{bound['port']}"
        codes = [requests.get(base + "/x").status_code for _ in range(4)]
        assert codes[:2] == [200, 200]
        assert 429 in codes[2:]
