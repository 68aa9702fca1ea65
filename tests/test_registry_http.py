"""Schema-registry HTTP shell: retry/backoff + caching contract of
pkg/schemaregistry/schemaregistry.go:80-160 against a fake transport."""

from __future__ import annotations

import json
import random

import pytest

from tipoca_stream_spark.sources.registry_http import (
    RegistryError,
    RegistryHTTPClient,
    get_latest_schema_with_retry,
    get_schema_with_retry,
    hydrate_registry,
)

AVRO = json.dumps({"type": "record", "name": "r", "fields": [{"name": "id", "type": "long"}]})


class FakeTransport:
    """Scriptable transport: responses is a list popped per call; the last
    entry repeats forever."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def __call__(self, method, path, body):
        self.calls.append((method, path, body))
        r = self.responses.pop(0) if len(self.responses) > 1 else self.responses[0]
        if isinstance(r, Exception):
            raise r
        return r


def test_get_schema_is_cached_by_id():
    t = FakeTransport([(200, {"schema": AVRO, "version": 3})])
    c = RegistryHTTPClient(t)
    s1 = c.get_schema(7)
    s2 = c.get_schema(7)
    assert s1 == s2 and s1.schema == AVRO and s1.version == 3
    assert len(t.calls) == 1  # second hit served from cache
    assert t.calls[0] == ("GET", "/schemas/ids/7", None)


def test_get_latest_schema_never_cached():
    t = FakeTransport(
        [(200, {"id": 7, "schema": AVRO, "version": 1}),
         (200, {"id": 9, "schema": AVRO, "version": 2})]
    )
    c = RegistryHTTPClient(t)
    assert c.get_latest_schema("db.server.customers").version == 1
    assert c.get_latest_schema("db.server.customers").version == 2  # re-fetched
    assert [p for _, p, _ in t.calls] == [
        "/subjects/db.server.customers-value/versions/latest"
    ] * 2


def test_key_subject_suffix():
    t = FakeTransport([(200, {"id": 1, "schema": AVRO, "version": 1})])
    RegistryHTTPClient(t).get_latest_schema("topic", key=True)
    assert t.calls[0][1] == "/subjects/topic-key/versions/latest"


def test_create_schema_posts_then_reads_latest():
    t = FakeTransport(
        [(200, {"id": 11}), (200, {"id": 11, "schema": AVRO, "version": 4})]
    )
    s = RegistryHTTPClient(t).create_schema("topic", AVRO)
    assert (s.id, s.version) == (11, 4)
    method, path, body = t.calls[0]
    assert (method, path) == ("POST", "/subjects/topic-value/versions")
    assert json.loads(body) == {"schema": AVRO, "schemaType": "AVRO"}


def test_retry_then_success_sleeps_in_reference_band():
    t = FakeTransport(
        [(500, "boom"), (503, "unavailable"), (200, {"schema": AVRO, "version": 1})]
    )
    sleeps = []
    s = get_schema_with_retry(
        RegistryHTTPClient(t), 5, attempts=5, sleep=sleeps.append, rng=random.Random(1)
    )
    assert s.schema == AVRO
    assert len(sleeps) == 2 and all(2 <= x <= 30 for x in sleeps)  # rand.Intn(30-2+1)+2


def test_retries_exhausted_raises_with_context():
    t = FakeTransport([(500, "boom")])
    with pytest.raises(RegistryError, match="schema id 5"):
        get_schema_with_retry(
            RegistryHTTPClient(t), 5, attempts=3, sleep=lambda _s: None,
            rng=random.Random(1),
        )
    assert len(t.calls) == 3  # exactly N attempts


def test_latest_retry_and_transport_exceptions_count_as_failures():
    t = FakeTransport(
        [ConnectionError("refused"), (200, {"id": 1, "schema": AVRO, "version": 9})]
    )
    s = get_latest_schema_with_retry(
        RegistryHTTPClient(t), "topic", attempts=2, sleep=lambda _s: None,
        rng=random.Random(1),
    )
    assert s.version == 9


def test_hydrate_fills_driver_side_cache():
    from tipoca_stream_spark.sources.debezium import SchemaRegistry

    t = FakeTransport([(200, {"schema": AVRO, "version": 1})])
    cache = SchemaRegistry()
    hydrate_registry(cache, RegistryHTTPClient(t), [3], sleep=lambda _s: None)
    assert cache.avro_schemas[3] == AVRO
