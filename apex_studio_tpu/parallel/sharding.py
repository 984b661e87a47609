"""Parameter and activation sharding.

Pattern-based rules (path regex → PartitionSpec), applied when weights are
loaded: checkpoints stream from disk straight onto the mesh with
``jax.device_put(array, NamedSharding(mesh, spec))`` — no full-model host
replica, no offloading gymnastics. This replaces the reference's group/budget
offloading machinery (memory_management/, 5.7k LoC) as the default memory
strategy: a v5e-8 holds the 14B-class DiTs in bf16 once TP-sharded.

Each model family ships a ``sharding_rules()`` describing its TP layout
(attention head projections column-split, output rows row-split, FFN
up/gate column-split, down row-split). Activations use
``constrain(x, spec)`` — a no-op off-mesh — to pin layouts at block edges
and let XLA insert the collectives.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

P = PartitionSpec

Rules = Sequence[Tuple[str, PartitionSpec]]


class ShardingRules:
    """Ordered (regex → PartitionSpec) rules over flattened parameter paths."""

    def __init__(self, rules: Rules, default: PartitionSpec = P()):
        self._rules: List[Tuple[re.Pattern, PartitionSpec]] = [
            (re.compile(pat), spec) for pat, spec in rules
        ]
        self.default = default

    def spec_for(self, path: str) -> PartitionSpec:
        for pat, spec in self._rules:
            if pat.search(path):
                return spec
        return self.default

    def __add__(self, other: "ShardingRules") -> "ShardingRules":
        merged = [(p.pattern, s) for p, s in self._rules] + [
            (p.pattern, s) for p, s in other._rules
        ]
        return ShardingRules(merged, default=self.default)


def _path_str(path: Tuple[Any, ...]) -> str:
    """Dot-joined leaf path, matching the checkpoint-key style the family
    sharding rules are written against (``blocks.0.attention.to_q.kernel``).
    The trailing ``.value`` of an nnx VariableState is stripped."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    s = ".".join(parts)
    return s[: -len(".value")] if s.endswith(".value") else s


def partition_specs_for(pytree: Any, rules: ShardingRules) -> Any:
    """Mirror ``pytree`` with a PartitionSpec per leaf."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: rules.spec_for(_path_str(path)), pytree
    )


def shard_pytree(pytree: Any, mesh: Optional[Mesh], rules: ShardingRules) -> Any:
    """Place every leaf on the mesh according to the rules (identity off-mesh)."""
    if mesh is None:
        return pytree

    def place(path, leaf):
        spec = rules.spec_for(_path_str(path))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, pytree)


def constrain(x: jax.Array, spec: PartitionSpec, mesh: Optional[Mesh] = None) -> jax.Array:
    """with_sharding_constraint that degrades to identity when no mesh is active."""
    from apex_studio_tpu.parallel.mesh import get_mesh

    mesh = mesh or get_mesh()
    if mesh is None or mesh.size == 1:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def named_sharding(spec: PartitionSpec, mesh: Optional[Mesh] = None) -> Optional[NamedSharding]:
    from apex_studio_tpu.parallel.mesh import get_mesh

    mesh = mesh or get_mesh()
    return None if mesh is None else NamedSharding(mesh, spec)
