"""Checkpoint loading for model-backed preprocessors: trainer-container
unwrapping (state_dict / model_state_dict / depth_model) and non-tensor
entry filtering (epochs, optimizer blobs)."""

import tempfile
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from apex_studio_tpu.preprocess.weights import _load_any


def _save(tmp, name, obj):
    p = Path(tmp) / name
    torch.save(obj, p)
    return p


def test_unwraps_model_state_dict(tmp_path):
    p = _save(tmp_path, "m.pth",
              {"model_state_dict": {"a.weight": torch.ones(2, 2)}, "epoch": 3})
    sd = _load_any(p)
    assert set(sd) == {"a.weight"}
    np.testing.assert_array_equal(sd["a.weight"], np.ones((2, 2)))


def test_unwraps_depth_model(tmp_path):
    p = _save(tmp_path, "l.pth",
              {"depth_model": {"b.bias": torch.zeros(3)}, "opt": {"lr": 1}})
    assert set(_load_any(p)) == {"b.bias"}


def test_flat_state_dict_passthrough(tmp_path):
    p = _save(tmp_path, "f.pth", {"c.weight": torch.ones(1)})
    assert set(_load_any(p)) == {"c.weight"}
