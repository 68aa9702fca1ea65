"""Mask-config version resolution: the reference operator's git cache as a
filesystem-backed analogue (O5 completion).

Reference behavior being mirrored (`pkg/git/git_cache.go:48-109`,
`controllers/redshiftsink_controller.go:128-175,399-407`):

- the operator resolves "the latest mask version" by cloning/pulling the
  config repo and taking the last commit hash that touched the mask file
  (`git log -1 <file>`); consumers then read the file FROM THE CLONE, so
  the version and the bytes can never disagree;
- versions are cached per file with a 30 s validity window behind a mutex;
  a refresh re-resolves every previously-seen file, and an error for any of
  them bursts the whole cache so the next call self-heals
  (git_cache.go:86-96);
- the controller compares the resolved version against
  ``Status.MaskStatus.CurrentMaskVersion`` and starts reload sink groups
  only when they differ (redshiftsink_controller.go:399-427).

Sandbox mapping: the "remote repo" is a plain directory (no network, no
git binary); ``clone``/``pull`` snapshot it into a cache dir, and the
commit hash becomes the sha1 of the file bytes in the snapshot —
content-addressed, so "version changed" ⇔ "bytes changed", which is the
property the controller actually relies on.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import threading
import time

DEFAULT_CACHE_VALIDITY_S = 30.0  # git_cache.go:40


class FileRepo:
    """``pkg/git``'s Clone/Pull/Log contract over a source directory."""

    def __init__(self, clone_dir: str, repo_url: str):
        self.clone_dir = clone_dir
        self.repo_url = repo_url  # a directory path in the sandbox

    def cloned(self) -> bool:
        # the reference stats <cloneDir>/.git; our marker is the snapshot dir
        return os.path.isdir(os.path.join(self.clone_dir, "_snapshot"))

    def _sync(self) -> None:
        dst = os.path.join(self.clone_dir, "_snapshot")
        tmp = dst + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(self.repo_url, tmp)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.replace(tmp, dst)

    clone = _sync
    pull = _sync

    def log1(self, file_path: str) -> str:
        """Latest version of ``file_path`` — `git log -1`'s hash becomes the
        sha1 of the snapshot's file bytes (content-addressed)."""
        local = self.local_path(file_path)
        with open(local, "rb") as f:
            return hashlib.sha1(f.read()).hexdigest()

    def local_path(self, file_path: str) -> str:
        return os.path.join(self.clone_dir, "_snapshot", file_path)


class ConfigVersionCache:
    """``GitCache`` (git_cache.go:17-109): per-file version cache with a
    validity window over a FileRepo. ``clock`` is injectable for tests."""

    def __init__(
        self,
        repo_url: str,
        cache_validity_s: float = DEFAULT_CACHE_VALIDITY_S,
        clone_dir: str | None = None,
        clock=time.monotonic,
    ):
        self.repo = FileRepo(clone_dir or tempfile.mkdtemp(prefix="cfgcache"), repo_url)
        self.cache_validity_s = cache_validity_s
        self._clock = clock
        self._lock = threading.Lock()
        self._file_version: dict[str, str] = {}
        self._last_refresh: float | None = None

    def _cache_valid(self) -> bool:
        return (
            self._last_refresh is not None
            and self._last_refresh + self.cache_validity_s > self._clock()
        )

    def get_file_version(self, file_path: str) -> str:
        """git_cache.go:48-105 — cached fast path, then clone-or-pull,
        re-resolve the requested file plus every previously-seen file, and
        burst the cache if any known file fails to resolve."""
        if self._cache_valid():
            cached = self._file_version.get(file_path)
            if cached is not None:
                return cached
        now = self._clock()
        with self._lock:
            if not self.repo.cloned():
                self.repo.clone()
            else:
                self.repo.pull()
            new_versions = {file_path: self.repo.log1(file_path)}
            for known in self._file_version:
                try:
                    new_versions[known] = self.repo.log1(known)
                except OSError:
                    # a known file vanished from the repo: burst the cache so
                    # the next update rebuilds it from scratch
                    # (git_cache.go:86-96)
                    self._file_version = {}
                    self._last_refresh = now
                    raise
            self._file_version = new_versions
            self._last_refresh = now
            return new_versions[file_path]

    def get_file_local_path(self, file_path: str) -> str:
        """Where the versioned bytes live — inside the snapshot, so readers
        see exactly the bytes the version hash covers
        (git_cache.go:107-109)."""
        return self.repo.local_path(file_path)
