"""Run-scoped metrics: per-stage record counters.

The reference counts imported rows per task
(``imported++``, delegate/MarketoBaseInputPluginDelegate.java:86-91)
and reports them in the TaskReport. Here a tiny named Ray actor
accumulates per-stage counters; hot stages flush one increment per
batch (thousands of rows), so the actor is never a bottleneck.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    """Counter sink shared by all stages of one run."""

    def __init__(self) -> None:
        self.counters: dict[str, int] = {}

    def inc(self, name: str, n: int) -> None:
        self.counters[name] = self.counters.get(name, 0) + n

    def get(self) -> dict[str, int]:
        return dict(self.counters)
