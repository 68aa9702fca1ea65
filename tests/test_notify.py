"""Release notifications: pkg/notify/notify.go contract + the releaser's
message format (controllers/release.go:178-211) over a fake transport."""

from __future__ import annotations

from tipoca_stream_spark.streaming.notify import (
    Notifier,
    notify_topic_release,
    release_message,
)


def test_release_message_golden():
    msg = release_message(
        schema="public",
        table="customers",
        repo="org/configs",
        file_path="masks/db.yaml",
        current_version="aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        desired_version="bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb",
    )
    assert msg == (
        "Released table *public.customers* with mask-version: "
        "<https://github.com/org/configs/blob/"
        "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb/masks/db.yaml | bbbbbb> "
        "and <https://github.com/org/configs/compare/"
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa..."
        "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb | mask-changes>."
    )


def test_short_version_not_truncated():
    assert "| v3>" in release_message("s", "t", "r", "f", "v2", "v3")


def test_notify_topic_release_parses_topic_and_posts():
    posts = []
    n = Notifier(lambda ch, text: posts.append((ch, text)), channel="#rel")
    notify_topic_release(n, "public", "db.server.customers", "org/c", "m.yaml", "v1", "v2abcdef")
    assert len(posts) == 1
    ch, text = posts[0]
    assert ch == "#rel" and "*public.customers*" in text and "v2abce" not in text
    assert "| v2abcd>" in text  # 6-char sha label


def test_notify_swallows_transport_errors_and_none_notifier():
    def boom(_ch, _text):
        raise ConnectionError("slack down")

    # must not raise (release.go:207-210 logs and continues)
    notify_topic_release(Notifier(boom, "#rel"), "s", "a.b.c", "r", "f", "v1", "v2")
    notify_topic_release(None, "s", "a.b.c", "r", "f", "v1", "v2")


def test_supervisor_release_pass_notifies(spark):
    from tipoca_stream_spark.streaming.supervisor import LagMonitor, Supervisor

    class FakeTarget:
        def swap_from(self, _other):
            pass

        def current_version(self):
            return 1

    class FakePipeline:
        def __init__(self):
            self.target = FakeTarget()

    posts = []
    sup = Supervisor(spark, lag_monitor=LagMonitor())
    sup.notifier = Notifier(lambda ch, text: posts.append(text), channel="#rel")
    sup.notify_schema = "public"
    sup.notify_repo = "org/configs"
    sup.notify_mask_file = "masks/db.yaml"
    sup._pending_mask = ("deadbeefcafe", object())
    sup.add_table("customers", FakePipeline())
    sup.begin_mask_reload("customers", FakePipeline())
    sup.lag.observe_progress("customers_reload", 0)  # realtime
    assert sup.release_pass() == ["customers"]
    assert len(posts) == 1
    assert "*public.customers*" in posts[0] and "| deadbe>" in posts[0]
