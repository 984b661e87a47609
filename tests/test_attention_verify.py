import numpy as np
import pytest

from apex_studio_tpu.ops.attention import attention_registry, set_default_backend
from apex_studio_tpu.ops.attention.verify import select_backend, verify_attention_backends


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    set_default_backend(None)
    for name in attention_registry.names(include_unavailable=True):
        attention_registry.set_available(name, True)


class TestVerification:
    def test_all_builtin_backends_verify_on_cpu(self, tmp_home):
        results = verify_attention_backends(force=True, use_cache=False)
        # On CPU: naive/xla/chunked must pass; pallas needs interpret mode.
        assert results["naive"] is None
        assert results["xla"] is None
        assert results["chunked"] is None

    def test_failing_backend_gets_disabled(self, tmp_home):
        attention_registry.add("broken_test_backend", lambda *a, **k: 1 / 0)
        try:
            results = verify_attention_backends(force=True, use_cache=False)
            assert results["broken_test_backend"] is not None
            assert not attention_registry.is_available("broken_test_backend")
        finally:
            attention_registry._entries.pop("broken_test_backend", None)

    def test_cache_roundtrip(self, tmp_home):
        first = verify_attention_backends(force=True)
        second = verify_attention_backends()  # cache hit
        assert first == second

    def test_select_backend_respects_priority(self, tmp_home):
        choice = select_backend(["chunked", "xla"])
        assert choice == "chunked"

    def test_select_backend_skips_unknown(self, tmp_home):
        choice = select_backend(["sage", "flash3", "xla"])  # CUDA-only names
        assert choice == "xla"
