"""Generate golden scheduler-parity fixtures by running the REFERENCE
scheduler implementations as oracles (SURVEY §4: "scheduler step equivalence
vs recorded PyTorch trajectories").

The reference schedulers import diffusers mixins that are not installed in
this environment, so thin structural stubs are injected first (they only
provide config registration — no numerical behavior). The recorded
trajectories come entirely from the reference's own step math.

Run:  python tests/fixtures/gen_scheduler_parity.py
Writes: tests/fixtures/parity/scheduler_trajectories.npz
        tests/fixtures/parity/torch_rng_streams.npz
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import torch

OUT_DIR = Path(__file__).parent / "parity"
REF = "/root/reference/apps/api"


def _install_diffusers_stub() -> None:
    diffusers = types.ModuleType("diffusers")
    cfg_mod = types.ModuleType("diffusers.configuration_utils")
    sched_mod = types.ModuleType("diffusers.schedulers")
    sched_utils = types.ModuleType("diffusers.schedulers.scheduling_utils")
    utils_mod = types.ModuleType("diffusers.utils")

    class ConfigMixin:
        config_name = "scheduler_config.json"

    class SchedulerMixin:
        pass

    class _Cfg(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    def register_to_config(fn):
        import functools
        import inspect

        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(fn)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            self.config = _Cfg(cfg)
            return fn(self, *args, **kwargs)

        return wrapper

    class SchedulerOutput:
        def __init__(self, prev_sample=None):
            self.prev_sample = prev_sample

    class BaseOutput(dict):
        def __init__(self, **kw):
            super().__init__(**kw)
            for k, v in kw.items():
                setattr(self, k, v)

        def __init_subclass__(cls, **kw):
            super().__init_subclass__(**kw)

    def deprecate(*a, **k):
        return None

    class KarrasDiffusionSchedulers:
        def __iter__(self):
            return iter(())

    KarrasDiffusionSchedulers = KarrasDiffusionSchedulers()  # iterable sentinel

    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config
    sched_utils.SchedulerMixin = SchedulerMixin
    sched_utils.SchedulerOutput = SchedulerOutput
    sched_utils.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    utils_mod.BaseOutput = BaseOutput
    utils_mod.deprecate = deprecate
    diffusers.configuration_utils = cfg_mod
    diffusers.utils = utils_mod
    diffusers.schedulers = sched_mod
    sched_mod.scheduling_utils = sched_utils
    for name, mod in (
        ("diffusers", diffusers),
        ("diffusers.configuration_utils", cfg_mod),
        ("diffusers.schedulers", sched_mod),
        ("diffusers.schedulers.scheduling_utils", sched_utils),
        ("diffusers.utils", utils_mod),
    ):
        sys.modules.setdefault(name, mod)


def _pseudo_model(x: torch.Tensor, t: float, c: torch.Tensor) -> torch.Tensor:
    """Deterministic 'velocity field' computable identically in JAX."""
    return torch.tanh(0.7 * x + 0.1 * (t / 1000.0)) + 0.05 * c


def record_unipc(steps: int, shift: float, solver_order: int):
    from src.scheduler.unipc import UniPCMultistepScheduler

    torch.manual_seed(0)
    x = torch.randn(1, 4, 8, 8, dtype=torch.float32)
    c = torch.randn(1, 4, 8, 8, dtype=torch.float32)
    x0_init = x.clone()

    sched = UniPCMultistepScheduler(solver_order=solver_order)
    sched.set_timesteps(steps, device="cpu", shift=shift)
    traj = []
    for t in sched.timesteps:
        v = _pseudo_model(x, float(t), c)
        x = sched.step(v, t, x, return_dict=False)[0]
        traj.append(x.numpy().copy())
    return {
        "init": x0_init.numpy(),
        "cond": c.numpy(),
        "timesteps": sched.timesteps.numpy().astype(np.float32),
        "traj": np.stack(traj),
    }


def record_flow_match(steps: int, shift: float):
    from src.scheduler.flow import FlowMatchScheduler

    torch.manual_seed(1)
    x = torch.randn(1, 4, 8, 8, dtype=torch.float32)
    c = torch.randn(1, 4, 8, 8, dtype=torch.float32)
    x0_init = x.clone()

    sched = FlowMatchScheduler(shift=shift, extra_one_step=True)
    sched.set_timesteps(steps)
    traj = []
    for t in sched.timesteps:
        v = _pseudo_model(x, float(t), c)
        out = sched.step(v, t, x)
        x = out[0] if isinstance(out, tuple) else out
        traj.append(x.numpy().copy())
    return {
        "init": x0_init.numpy(),
        "cond": c.numpy(),
        "timesteps": sched.timesteps.numpy().astype(np.float32),
        "traj": np.stack(traj),
    }


def record_rng_streams():
    """Torch CPU generator streams — the seed-to-latent contract the engines
    reproduce via their torch-CPU shim (SURVEY Appendix D)."""
    out = {}
    for seed in (0, 7, 1234):
        g = torch.Generator("cpu").manual_seed(seed)
        out[f"randn_seed{seed}"] = torch.randn(
            (1, 16, 3, 8, 8), generator=g, dtype=torch.float32
        ).numpy()
    return out


def main():
    _install_diffusers_stub()
    sys.path.insert(0, REF)
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    fixtures = {}
    for steps in (10,):
        for order in (2,):
            for shift in (5.0, 8.0):
                rec = record_unipc(steps, shift, order)
                for k, v in rec.items():
                    fixtures[f"unipc_s{steps}_o{order}_sh{shift}_{k}"] = v
        for shift in (3.0, 7.0):
            rec = record_flow_match(steps, shift)
            for k, v in rec.items():
                fixtures[f"flow_s{steps}_sh{shift}_{k}"] = v
    np.savez_compressed(OUT_DIR / "scheduler_trajectories.npz", **fixtures)

    np.savez_compressed(OUT_DIR / "torch_rng_streams.npz", **record_rng_streams())
    print("wrote", OUT_DIR)


if __name__ == "__main__":
    main()
