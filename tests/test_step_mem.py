"""step_mem tracing utility (reference src/utils/step_mem.py:274)."""

import io

import numpy as np
import jax.numpy as jnp


class TestStepMem:
    def test_snapshot_contents_and_print(self):
        from apex_studio_tpu.utils.step_mem import step_mem

        keep = jnp.ones((64, 128), jnp.float32)  # noqa: F841 live array
        buf = io.StringIO()
        # top must cover every live array: under the full suite hundreds of
        # arrays from other tests are still alive
        snap = step_mem("unit test", top=100000, file=buf, pause=False)
        text = buf.getvalue()
        assert "[step_mem] unit test" in text
        assert "host rss=" in text
        assert snap["host"]["rss"] is None or snap["host"]["rss"] > 0
        assert isinstance(snap["devices"], list)
        shapes = {r["shape"] for r in snap["arrays"]}
        assert "(64, 128)" in shapes

    def test_grouping_collapses_identical_arrays(self):
        from apex_studio_tpu.utils.step_mem import collect_live_arrays

        keep = [jnp.zeros((32, 32), jnp.float32) + i for i in range(4)]  # noqa: F841
        rows = collect_live_arrays(top=50)
        row = next(r for r in rows if r["shape"] == "(32, 32)")
        assert row["count"] >= 4
        assert row["nbytes"] >= 4 * 32 * 32 * 4
