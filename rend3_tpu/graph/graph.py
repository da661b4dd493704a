"""RenderGraph: declarative frame scheduling.

Reference: rend3/src/graph/ (graph.rs, node.rs) — nodes declare read/write
resources; execute() flattens data dependencies, prunes dead nodes by a
reverse sweep from surviving outputs, and runs the surviving nodes in order.

In the TPU build a node's `execute` closure contributes jnp computations to a
traced frame function, so the reference's transient-texture aliasing and
renderpass merging are subsumed by XLA buffer assignment and fusion; what
remains valuable — and is implemented here — is the declarative structure,
dead-node elimination (avoiding tracing work whose outputs nobody reads),
data handles, and per-node profiling scopes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Set, Tuple

__all__ = ["RenderGraph", "RenderTargetDesc", "GraphNodeBuilder", "NodeExecContext"]


@dataclass(frozen=True)
class RenderTargetDesc:
    """Description of a transient render target (shape + dtype + samples)."""

    label: str
    width: int
    height: int
    channels: int = 4
    samples: int = 1
    dtype: str = "float32"


@dataclass
class _Resource:
    kind: str          # "texture" | "data" | "external"
    desc: Optional[RenderTargetDesc] = None
    value: Any = None
    imported: bool = False


@dataclass
class _Node:
    label: str
    inputs: Tuple[int, ...]
    outputs: Tuple[int, ...]
    execute: Callable
    external: bool = False  # has side effects beyond graph resources


class NodeExecContext:
    """Handed to node closures: read/write graph resources by handle."""

    def __init__(self, graph: "RenderGraph"):
        self._graph = graph

    def get(self, handle: int) -> Any:
        return self._graph._resources[handle].value

    def set(self, handle: int, value: Any) -> None:
        self._graph._resources[handle].value = value


class GraphNodeBuilder:
    """reference: rend3/src/graph/node.rs RenderGraphNodeBuilder."""

    def __init__(self, graph: "RenderGraph", label: str):
        self._graph = graph
        self._label = label
        self._inputs: List[int] = []
        self._outputs: List[int] = []
        self._external = False

    def add_input(self, handle: int) -> "GraphNodeBuilder":
        self._inputs.append(handle)
        return self

    def add_output(self, handle: int) -> "GraphNodeBuilder":
        self._inputs.append(handle)   # an output is also a dependency (RMW order)
        self._outputs.append(handle)
        return self

    def add_external_output(self) -> "GraphNodeBuilder":
        self._external = True
        return self

    def build(self, execute: Callable[[NodeExecContext], None]) -> None:
        self._graph._nodes.append(
            _Node(
                label=self._label,
                inputs=tuple(self._inputs),
                outputs=tuple(self._outputs),
                execute=execute,
                external=self._external,
            )
        )


class RenderGraph:
    def __init__(self):
        self._resources: List[_Resource] = []
        self._nodes: List[_Node] = []
        self.timings: List[Tuple[str, float]] = []

    # -- resource declaration -------------------------------------------------

    def add_render_target(self, desc: RenderTargetDesc) -> int:
        self._resources.append(_Resource(kind="texture", desc=desc))
        return len(self._resources) - 1

    def add_imported_render_target(self, value: Any, desc: Optional[RenderTargetDesc] = None) -> int:
        self._resources.append(_Resource(kind="external", desc=desc, value=value, imported=True))
        return len(self._resources) - 1

    def add_data(self, value: Any = None) -> int:
        self._resources.append(_Resource(kind="data", value=value))
        return len(self._resources) - 1

    def add_node(self, label: str) -> GraphNodeBuilder:
        return GraphNodeBuilder(self, label)

    # -- execution -------------------------------------------------------------

    def _prune(self) -> List[_Node]:
        """Dead-node elimination: reverse sweep keeping nodes that feed
        imported targets or external outputs (reference: graph.rs:185-202)."""
        live_resources: Set[int] = {
            i for i, r in enumerate(self._resources) if r.imported
        }
        keep: List[_Node] = []
        for node in reversed(self._nodes):
            alive = node.external or any(o in live_resources for o in node.outputs)
            if alive:
                live_resources.update(node.inputs)
                keep.append(node)
        keep.reverse()
        return keep

    def execute(self) -> Dict[str, Any]:
        """Run surviving nodes in submission order; returns imported-target
        values by label."""
        self.timings = []
        ctx = NodeExecContext(self)
        for node in self._prune():
            t0 = time.perf_counter()
            node.execute(ctx)
            self.timings.append((node.label, time.perf_counter() - t0))
        return {
            (r.desc.label if r.desc else f"imported{i}"): r.value
            for i, r in enumerate(self._resources)
            if r.imported
        }
