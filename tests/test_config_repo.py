"""Config version resolution (O5 completion): filesystem analogue of the
operator's git cache (pkg/git/git_cache.go:48-109) and the controller's
fetchLatestMaskFileVersion → currentMaskVersion reconcile flow
(controllers/redshiftsink_controller.go:128-175,399-427)."""

from __future__ import annotations

import os
import textwrap

import pytest

from tipoca_stream_spark.sources.config_repo import ConfigVersionCache

V1_YAML = textwrap.dedent(
    """
    non_pii_keys:
        customers:
        - id
        settings:
        - id
    """
)

# customers' rules change; settings' stay identical
V2_YAML = textwrap.dedent(
    """
    non_pii_keys:
        customers:
        - id
        - email
        settings:
        - id
    """
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _repo(tmp_path, yaml_text):
    repo = tmp_path / "remote"
    repo.mkdir(exist_ok=True)
    (repo / "mask.yaml").write_text(yaml_text)
    return str(repo)


def test_version_is_content_addressed_and_cached(tmp_path):
    clock = FakeClock()
    cache = ConfigVersionCache(
        _repo(tmp_path, V1_YAML),
        cache_validity_s=30.0,
        clone_dir=str(tmp_path / "clone"),
        clock=clock,
    )
    v1 = cache.get_file_version("mask.yaml")
    assert len(v1) == 40  # sha1 hex, the commit-hash analogue

    # mutate the remote inside the validity window: cached version holds,
    # and the snapshot (the bytes consumers read) still matches v1
    (tmp_path / "remote" / "mask.yaml").write_text(V2_YAML)
    clock.t = 10.0
    assert cache.get_file_version("mask.yaml") == v1
    with open(cache.get_file_local_path("mask.yaml")) as f:
        assert f.read() == V1_YAML

    # past the validity window: pull + re-resolve picks up the new version
    clock.t = 31.0
    v2 = cache.get_file_version("mask.yaml")
    assert v2 != v1
    with open(cache.get_file_local_path("mask.yaml")) as f:
        assert f.read() == V2_YAML


def test_refresh_error_bursts_cache_then_self_heals(tmp_path):
    clock = FakeClock()
    repo = tmp_path / "remote"
    repo.mkdir()
    (repo / "a.yaml").write_text("x: 1\n")
    (repo / "b.yaml").write_text("y: 2\n")
    cache = ConfigVersionCache(
        str(repo), cache_validity_s=30.0, clone_dir=str(tmp_path / "clone"), clock=clock
    )
    cache.get_file_version("a.yaml")
    cache.get_file_version("b.yaml")

    # b vanishes from the remote: the next refresh re-resolves all known
    # files, fails on b, and bursts the cache (git_cache.go:86-96)
    os.remove(repo / "b.yaml")
    clock.t = 31.0
    with pytest.raises(OSError):
        cache.get_file_version("a.yaml")
    # next update fixes it: a resolves again, b is no longer tracked
    clock.t = 62.0
    assert cache.get_file_version("a.yaml")
    with pytest.raises(OSError):
        cache.get_file_version("b.yaml")


def test_supervisor_version_driven_reconcile(spark, tmp_path):
    from tipoca_stream_spark.streaming.supervisor import Supervisor

    class FakePipeline:
        def __init__(self, name):
            self.name = name
            self.target = None

    clock = FakeClock()
    cache = ConfigVersionCache(
        _repo(tmp_path, V1_YAML),
        cache_validity_s=0.0,  # always refresh — exercises the pull path
        clone_dir=str(tmp_path / "clone"),
        clock=clock,
    )
    sup = Supervisor(spark)
    for n in ["customers", "settings"]:
        sup.tables[n] = type(
            "MT", (), {"main": FakePipeline(n), "reload": None, "released": True}
        )()

    factory = lambda n: FakePipeline(f"{n}_reload")

    # first deployment (currentMaskVersion empty): every included table reloads
    begun = sup.reconcile_mask_file(cache, "mask.yaml", salt="s", reload_factory=factory)
    assert sorted(begun) == ["customers", "settings"]
    assert sup.current_mask_version is None  # commits only after release

    # simulate release: reloads retire → version commits
    for t in sup.tables.values():
        t.reload, t.released = None, True
    sup.release_pass()
    v1 = sup.current_mask_version
    assert v1 is not None and sup.current_mask_config is not None

    # same file version → no-op, no reloads begun
    assert sup.reconcile_mask_file(cache, "mask.yaml", salt="s", reload_factory=factory) == []

    # version bump changing ONLY customers → only customers reloads
    (tmp_path / "remote" / "mask.yaml").write_text(V2_YAML)
    begun = sup.reconcile_mask_file(cache, "mask.yaml", salt="s", reload_factory=factory)
    assert begun == ["customers"]
    assert sup.tables["settings"].reload is None
    assert sup.current_mask_version == v1  # still in flight

    for t in sup.tables.values():
        t.reload, t.released = None, True
    sup.release_pass()
    assert sup.current_mask_version != v1
    assert "email" in sup.current_mask_config.tables["customers"].non_pii_keys
