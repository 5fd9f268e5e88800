"""Confluent Schema Registry client (read-only subset the engine needs).

The reference resolves writer schemas per message through the registry HTTP
API (reference main.py:6-9,22 with the registry provisioned at :8081,
docker-compose.yml:84-101). Spark resolves the schema once at plan time
instead (SURVEY.md §4): fetch latest (or by id) at stream start, pass the
JSON to the decoder, restart the stream on evolution (D5).

stdlib-urllib implementation — the reference pulls in httpx
(requirements.txt:4) but the engine keeps zero extra dependencies.
"""

from __future__ import annotations

import json
import urllib.request


class SchemaRegistryClient:
    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._by_id: dict[int, str] = {}

    def _get(self, path: str) -> dict:
        with urllib.request.urlopen(self.base_url + path, timeout=self.timeout) as r:
            return json.loads(r.read().decode("utf-8"))

    def latest_schema(self, subject: str) -> tuple[int, str]:
        """(schema_id, schema_json) of a subject's latest version — e.g.
        subject 'pg.public.users-value' for the reference topic."""
        doc = self._get(f"/subjects/{subject}/versions/latest")
        return int(doc["id"]), doc["schema"]

    def schema_by_id(self, schema_id: int) -> str:
        """Writer schema by the id carried in the Confluent header (cached —
        the per-message resolution the reference client does, main.py:22)."""
        if schema_id not in self._by_id:
            doc = self._get(f"/schemas/ids/{schema_id}")
            self._by_id[schema_id] = doc["schema"]
        return self._by_id[schema_id]
