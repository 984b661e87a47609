import json
import threading

from apex_studio_tpu.utils import config_store
from apex_studio_tpu.utils.progress import ProgressReporter, make_mapped_progress, safe_emit_progress


class TestConfigStore:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "cfg.json"
        config_store.write_config({"a": 1}, path=p)
        assert config_store.read_config(path=p) == {"a": 1}
        config_store.set_config_value("b", [1, 2], path=p)
        assert config_store.get_config_value("b", path=p) == [1, 2]
        config_store.delete_config_value("a", path=p)
        assert config_store.get_config_value("a", "gone", path=p) == "gone"

    def test_corrupt_file_reads_empty(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text("{not json")
        assert config_store.read_config(path=p) == {}

    def test_concurrent_writers_never_tear(self, tmp_path):
        p = tmp_path / "cfg.json"

        def writer(i):
            for j in range(25):
                config_store.set_config_value(f"k{i}", j, path=p)

        threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        cfg = json.loads(p.read_text())  # must always be valid JSON
        assert all(cfg[f"k{i}"] == 24 for i in range(4))


class TestProgress:
    def test_safe_emit_swallows_errors(self):
        def bad(p, m, md):
            raise RuntimeError("boom")

        safe_emit_progress(bad, 0.5, "x")  # must not raise

    def test_mapped_progress(self):
        seen = []
        cb = lambda p, m, md: seen.append(p)
        mapped = make_mapped_progress(cb, 0.2, 0.6)
        mapped(0.0, "", {})
        mapped(0.5, "", {})
        mapped(1.0, "", {})
        mapped(None, "", {})
        assert seen == [0.2, 0.4, 0.6, None]

    def test_mapped_clamps(self):
        seen = []
        mapped = make_mapped_progress(lambda p, m, md: seen.append(p), 0.0, 1.0)
        mapped(2.0, "", {})
        assert seen == [1.0]

    def test_reporter_stage_metadata(self):
        seen = {}
        rep = ProgressReporter(lambda p, m, md: seen.update(md), stage="denoise")
        rep(0.5, "step")
        assert seen["stage"] == "denoise"

    def test_reporter_sub_range(self):
        seen = []
        rep = ProgressReporter(lambda p, m, md: seen.append(p))
        sub = rep.sub(0.5, 1.0)
        sub(0.5, "")
        assert seen == [0.75]


def test_defaults_env_override(tmp_home, monkeypatch):
    from apex_studio_tpu.utils import defaults

    assert str(defaults.home_dir()) == str(tmp_home)
    assert defaults.get_components_path() == tmp_home / "components"
    monkeypatch.setenv("APEX_COMPONENTS_PATH", "/tmp/elsewhere")
    assert str(defaults.get_components_path()) == "/tmp/elsewhere"
    defaults.ensure_dirs()
    assert (tmp_home / "results").is_dir()
