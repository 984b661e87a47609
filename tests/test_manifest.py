import pytest
import yaml

from apex_studio_tpu.manifest.loader import load_manifest, validate_and_normalize
from apex_studio_tpu.manifest.resolver import ManifestResolver
from apex_studio_tpu.manifest.schema import ManifestValidationError, validate_manifest_v1


def v1_doc(**spec_extra):
    spec = {
        "engine": "zimage",
        "model_type": "t2i",
        "engine_type": "jax",
        "components": [
            {"type": "scheduler", "base": "FlowMatchEulerDiscreteScheduler"},
            {"type": "transformer", "base": "zimage.base", "name": "dit"},
        ],
        "defaults": {"run": {"num_inference_steps": 9}},
    }
    spec.update(spec_extra)
    return {
        "api_version": "apex/v1",
        "kind": "Model",
        "metadata": {"id": "test-model", "name": "Test Model", "version": "1.2.3"},
        "spec": spec,
    }


class TestValidation:
    def test_valid_doc_passes(self):
        validate_manifest_v1(v1_doc())

    def test_missing_engine_fails(self):
        doc = v1_doc()
        del doc["spec"]["engine"]
        with pytest.raises(ManifestValidationError, match="engine"):
            validate_manifest_v1(doc)

    def test_bad_kind_fails(self):
        doc = v1_doc()
        doc["kind"] = "Widget"
        with pytest.raises(ManifestValidationError, match="kind"):
            validate_manifest_v1(doc)

    def test_bad_component_type_fails(self):
        doc = v1_doc(components=[{"type": "flux_capacitor"}])
        with pytest.raises(ManifestValidationError, match="flux_capacitor"):
            validate_manifest_v1(doc)

    def test_bad_semver_fails(self):
        doc = v1_doc()
        doc["metadata"]["version"] = "1.2"
        with pytest.raises(ManifestValidationError, match="semver"):
            validate_manifest_v1(doc)

    def test_variant_model_paths(self):
        doc = v1_doc(
            components=[
                {
                    "type": "transformer",
                    "base": "zimage.base",
                    "model_path": [
                        {"path": "org/repo/model.safetensors", "variant": "default"},
                        {"path": "org/repo/model-q8.gguf", "variant": "GGUF_Q8_0", "type": "gguf"},
                    ],
                }
            ]
        )
        validate_manifest_v1(doc)

    def test_variant_without_path_fails(self):
        doc = v1_doc(
            components=[{"type": "transformer", "model_path": [{"variant": "x"}]}]
        )
        with pytest.raises(ManifestValidationError, match="path"):
            validate_manifest_v1(doc)


class TestNormalization:
    def test_v1_maps_to_engine_shape(self):
        out = validate_and_normalize(v1_doc())
        assert out["name"] == "Test Model"
        assert out["engine"] == "zimage"
        assert out["type"] == "t2i"
        assert out["engine_type"] == "jax"
        assert out["defaults"] == {"run": {"num_inference_steps": 9}}
        assert out["version"] == "1.2.3"
        # components got stable names
        assert out["components"][0]["name"] == "scheduler"
        assert out["components"][1]["name"] == "dit"

    def test_legacy_passthrough(self):
        doc = {"name": "Old", "engine": "wan", "type": "t2v"}
        assert validate_and_normalize(doc) is doc

    def test_camelcase_spellings(self):
        doc = v1_doc()
        spec = doc["spec"]
        del spec["model_type"]
        spec["modelType"] = "t2i"
        del spec["engine_type"]
        spec["engineType"] = "jax"
        out = validate_and_normalize(doc)
        assert out["type"] == "t2i"
        assert out["engine_type"] == "jax"

    def test_ui_normalization(self):
        doc = v1_doc(
            ui={
                "mode": "SIMPLE",
                "simple": {"inputs": [{"id": "steps", "type": "Integer"}]},
            }
        )
        out = validate_and_normalize(doc)
        assert out["ui"]["mode"] == "simple"
        assert out["ui"]["simple"]["inputs"][0]["component"] == "number"

    def test_unknown_spec_keys_pass_through(self):
        doc = v1_doc(custom_field={"a": 1})
        out = validate_and_normalize(doc)
        assert out["custom_field"] == {"a": 1}

    def test_save_maps_to_save_kwargs(self):
        doc = v1_doc(save={"fps": 16})
        out = validate_and_normalize(doc)
        assert out["save_kwargs"] == {"fps": 16}


class TestSharedFragments:
    def test_shared_components_merge(self, tmp_path):
        shared = {
            "api_version": "apex/v1",
            "kind": "Model",
            "metadata": {"name": "wan shared"},
            "spec": {
                "engine": "wan",
                "model_type": "shared",
                "components": [
                    {"type": "vae", "base": "wan", "name": "vae"},
                    {"type": "text_encoder", "base": "UMT5EncoderModel", "name": "te"},
                ],
            },
        }
        (tmp_path / "shared").mkdir()
        (tmp_path / "shared" / "wan-common.yml").write_text(yaml.safe_dump(shared))

        doc = v1_doc(
            engine="wan",
            shared=["shared/wan-common.yml"],
            components=[{"type": "vae", "base": "override", "name": "vae"}],
        )
        (tmp_path / "model.yml").write_text(yaml.safe_dump(doc))

        out = load_manifest(tmp_path / "model.yml")
        vaes = [c for c in out["components"] if c["type"] == "vae"]
        tes = [c for c in out["components"] if c["type"] == "text_encoder"]
        assert len(vaes) == 1 and vaes[0]["base"] == "override"  # local wins
        assert len(tes) == 1 and tes[0]["base"] == "UMT5EncoderModel"


class TestResolver:
    def _write(self, root, rel, doc):
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(yaml.safe_dump(doc))
        return p

    def test_resolution_forms(self, tmp_path):
        doc = v1_doc()
        self._write(tmp_path / "m", "image/test-model-1.2.3.v1.yml", doc)
        r = ManifestResolver(search_paths=[tmp_path / "m"])

        for ref in (
            "test-model",
            "test-model:latest",
            "test-model:1.2.3",
            "zimage/test-model",
            "zimage/t2i/test-model",
        ):
            assert r.resolve(ref) is not None, ref
        assert r.resolve("missing-model") is None

    def test_latest_prefers_highest_version(self, tmp_path):
        old = v1_doc()
        old["metadata"]["version"] = "1.0.0"
        new = v1_doc()
        new["metadata"]["version"] = "2.0.0"
        self._write(tmp_path / "m", "image/a.yml", old)
        p_new = self._write(tmp_path / "m", "image/b.yml", new)
        r = ManifestResolver(search_paths=[tmp_path / "m"])
        assert r.resolve("test-model:latest") == str(p_new.resolve())
        assert r.resolve("test-model") == str(p_new.resolve())

    def test_category_and_listing(self, tmp_path):
        self._write(tmp_path / "m", "image/a.yml", v1_doc())
        r = ManifestResolver(search_paths=[tmp_path / "m"])
        infos = r.list()
        assert len(infos) == 1
        assert infos[0].category == "image"
        assert infos[0].summary()["id"] == "test-model"

    def test_yaml_path_shortcut(self, tmp_path):
        p = self._write(tmp_path, "direct.yml", v1_doc())
        r = ManifestResolver(search_paths=[])
        assert r.resolve(str(p)) == str(p.resolve())
