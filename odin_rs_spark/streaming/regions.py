"""Per-region subscription lifecycle (T12; parity target: wind-client
region subscription odin_wind/src/actor.rs:112-201, region store
odin_wind/src/lib.rs:292-353).

The reference starts a WindNinja pipeline when the first client
subscribes to a region and tears it down when the last one leaves. The
Spark restatement: a driver-side manager that refcounts (region →
clients), starts one streaming query per active region (the factory
returns a started StreamingQuery or any object with .stop()), and stops
it on last unsubscribe. Region definitions are shared through the K8
SharedStore so other sessions/components see subscription changes as a
change feed."""

from __future__ import annotations

from typing import Callable

from odin_rs_spark.sinks.products import SharedStore


class RegionManager:
    def __init__(
        self,
        query_factory: Callable[[str, dict], object],
        store: SharedStore | None = None,
    ):
        self._factory = query_factory
        self._store = store
        self._clients: dict[str, set[str]] = {}
        self._queries: dict[str, object] = {}

    def add_client(self, region: str, client_id: str, region_conf: dict | None = None) -> None:
        clients = self._clients.setdefault(region, set())
        if not clients:
            # start the query BEFORE registering the client: if the
            # factory throws (transient start failure), no client is
            # recorded, so the next subscriber retries the factory
            # instead of joining a permanently queryless region
            try:
                self._queries[region] = self._factory(region, region_conf or {})
            except Exception:
                if not clients:
                    self._clients.pop(region, None)
                raise
            if self._store is not None:
                self._store.set(
                    f"region/{region}", {"active": True, "conf": region_conf or {}}
                )
        clients.add(client_id)

    def remove_client(self, region: str, client_id: str) -> None:
        clients = self._clients.get(region)
        if not clients:
            return
        clients.discard(client_id)
        if not clients:
            q = self._queries.pop(region, None)
            if q is not None:
                q.stop()
            del self._clients[region]
            if self._store is not None:
                self._store.remove(f"region/{region}")

    def active_regions(self) -> list[str]:
        return sorted(self._queries)

    def shutdown(self) -> None:
        for region in list(self._clients):
            for client in list(self._clients.get(region, ())):
                self.remove_client(region, client)
