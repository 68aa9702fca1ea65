"""Confluent schema-registry HTTP client shell (S-registry parity).

Mirrors `pkg/schemaregistry/schemaregistry.go`:

- ``get_schema(id)`` — cached per id (srclient caches by-id lookups; the
  reference comment "GetSchema returns the cached response if cache hit",
  schemaregistry.go:80-88);
- ``get_latest_schema(subject, key)`` — NEVER cached ("always makes a call
  to registry everytime", schemaregistry.go:90-100): latest is a moving
  target;
- ``create_schema(subject, schema, type, key)`` — POST, returns the
  registered schema (schemaregistry.go:102-113);
- ``get_schema_with_retry`` / ``get_latest_schema_with_retry`` — N
  attempts with a uniform 2-30 s sleep between tries
  (schemaregistry.go:115-160).

The sandbox has no network, so the TRANSPORT IS INJECTED: any callable
``(method, path, body|None) -> (status, parsed_json)``. A real deployment
passes an urllib/requests-backed transport; tests pass fakes. The REST
paths are the public Confluent Schema Registry API. ``sleep`` and ``rng``
are injectable so the retry cadence is testable without wall-clock."""

from __future__ import annotations

import json
import random
import time
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RegistrySchema:
    """schemaregistry.go:22-43 (Schema accessor struct)."""

    id: int
    schema: str  # Avro schema JSON string
    version: int


class RegistryError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(f"registry error {status}: {message}")
        self.status = status


def _subject(subject: str, key: bool) -> str:
    # Confluent subject naming: <topic>-key / <topic>-value
    return f"{subject}-{'key' if key else 'value'}"


@dataclass
class RegistryHTTPClient:
    """transport: (method, path, body|None) -> (status, parsed_json)."""

    transport: object
    _by_id: dict[int, RegistrySchema] = field(default_factory=dict)

    def get_schema(self, schema_id: int) -> RegistrySchema:
        """GET /schemas/ids/{id}, cached per id — ids are immutable in the
        registry, so the cache can never go stale."""
        hit = self._by_id.get(schema_id)
        if hit is not None:
            return hit
        status, body = self.transport("GET", f"/schemas/ids/{schema_id}", None)
        if status != 200:
            raise RegistryError(status, str(body))
        schema = RegistrySchema(
            id=schema_id,
            schema=body["schema"],
            version=int(body.get("version", -1)),
        )
        self._by_id[schema_id] = schema
        return schema

    def get_latest_schema(self, subject: str, key: bool = False) -> RegistrySchema:
        """GET /subjects/{subject}/versions/latest — never cached."""
        status, body = self.transport(
            "GET", f"/subjects/{_subject(subject, key)}/versions/latest", None
        )
        if status != 200:
            raise RegistryError(status, str(body))
        return RegistrySchema(
            id=int(body["id"]), schema=body["schema"], version=int(body["version"])
        )

    def create_schema(
        self, subject: str, schema: str, schema_type: str = "AVRO", key: bool = False
    ) -> RegistrySchema:
        """POST /subjects/{subject}/versions, then read back the latest —
        srclient's CreateSchema contract."""
        status, body = self.transport(
            "POST",
            f"/subjects/{_subject(subject, key)}/versions",
            json.dumps({"schema": schema, "schemaType": schema_type}),
        )
        if status != 200:
            raise RegistryError(status, str(body))
        return self.get_latest_schema(subject, key)


def _retry(fn, attempts: int, sleep, rng, what: str):
    """schemaregistry.go:115-138: N attempts, uniform 2-30 s between."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as err:  # noqa: BLE001 — the reference retries any error
            if i >= attempts - 1:
                raise RegistryError(
                    getattr(err, "status", -1), f"failed to get {what}: {err}"
                ) from err
            sleep(rng.randint(2, 30))
    raise AssertionError("unreachable")


def get_schema_with_retry(
    client: RegistryHTTPClient,
    schema_id: int,
    attempts: int = 5,
    sleep=time.sleep,
    rng: random.Random | None = None,
) -> RegistrySchema:
    rng = rng or random.Random()
    return _retry(
        lambda: client.get_schema(schema_id), attempts, sleep, rng, f"schema id {schema_id}"
    )


def get_latest_schema_with_retry(
    client: RegistryHTTPClient,
    subject: str,
    key: bool = False,
    attempts: int = 5,
    sleep=time.sleep,
    rng: random.Random | None = None,
) -> RegistrySchema:
    rng = rng or random.Random()
    return _retry(
        lambda: client.get_latest_schema(subject, key),
        attempts,
        sleep,
        rng,
        f"latest schema for {subject}",
    )


def hydrate_registry(cache, client: RegistryHTTPClient, schema_ids, attempts: int = 5,
                     sleep=time.sleep, rng: random.Random | None = None) -> None:
    """Fill a driver-side ``SchemaRegistry`` (sources/debezium.py) from the
    HTTP client — the GetSchema cache-fill the batcher does per claimed
    wire id (serializer.go:54-61). Existing in-process registration keeps
    working unchanged; this is the network-backed fill path."""
    for schema_id in schema_ids:
        schema = get_schema_with_retry(client, schema_id, attempts, sleep, rng)
        cache.register_avro(schema_id, schema.schema)
