"""Per-epoch crawl metrics.

Replaces the reference's lock-free thread-mutated instance counters
(`/root/reference/crawlers/globus_base_preserved.py:65-75,398-403`) and the
Postgres ``crawl_stats`` row (`utils/psql_cmds.txt`,
`crawlers/utils/crawler_utils.py:64-87`) with a single zero-CPU actor that
stages increment fire-and-forget; the epoch driver drains it into the
``crawl_stats`` parquet table per epoch. Counter volume is O(stages ×
batches), never O(rows).
"""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counters: dict[tuple[int, str], int] = defaultdict(int)

    def add(self, epoch: int, name: str, value: int) -> None:
        self.counters[(epoch, name)] += int(value)

    def add_many(self, epoch: int, values: dict) -> None:
        for name, v in values.items():
            self.counters[(epoch, name)] += int(v)

    def epoch_counters(self, epoch: int) -> dict[str, int]:
        return {k[1]: v for k, v in self.counters.items() if k[0] == epoch}

    def all_counters(self) -> dict[str, int]:
        return {f"{e}:{n}": v for (e, n), v in self.counters.items()}


class LocalMetrics:
    """Driver-local drop-in for MetricsActor (small-epoch fast path)."""

    def __init__(self, actor=None):
        self.actor = actor
        self.local: dict[tuple[int, str], int] = defaultdict(int)

    def add(self, epoch: int, name: str, value: int) -> None:
        if self.actor is not None:
            self.actor.add.remote(epoch, name, value)
        else:
            self.local[(epoch, name)] += int(value)

    def epoch_counters(self, epoch: int) -> dict[str, int]:
        if self.actor is not None:
            return ray.get(self.actor.epoch_counters.remote(epoch))
        return {k[1]: v for k, v in self.local.items() if k[0] == epoch}
