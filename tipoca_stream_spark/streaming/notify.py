"""Release notifications (O6 completion): `pkg/notify/notify.go:17-33` +
the releaser's message format (`controllers/release.go:178-211`).

The reference posts to Slack via chat.postMessage; the sandbox has no
network, so the TRANSPORT IS INJECTED — any callable
``(channel, text) -> None`` (a real deployment passes a Slack-API-backed
callable; tests pass a list appender). Notification failures are logged
and swallowed, exactly as release.go:207-210 does: a release must never
fail because the announcement did."""

from __future__ import annotations

import logging

log = logging.getLogger(__name__)


class Notifier:
    """notify.go:17-33 — Notify(message) over an injected transport."""

    def __init__(self, transport, channel: str):
        self.transport = transport
        self.channel = channel

    def notify(self, message: str) -> None:
        self.transport(self.channel, message)


def release_message(
    schema: str,
    table: str,
    repo: str,
    file_path: str,
    current_version: str,
    desired_version: str,
) -> str:
    """release.go:186-205's exact message shape: table, a link to the mask
    file at the released version (short sha label), and a compare link
    between the versions."""
    sha = desired_version[:6] if len(desired_version) >= 6 else desired_version
    return (
        f"Released table *{schema}.{table}* with mask-version: "
        f"<https://github.com/{repo}/blob/{desired_version}/{file_path} | {sha}> "
        f"and <https://github.com/{repo}/compare/{current_version}...{desired_version} "
        f"| mask-changes>."
    )


def notify_topic_release(
    notifier: Notifier | None,
    schema: str,
    topic: str,
    repo: str,
    file_path: str,
    current_version: str,
    desired_version: str,
) -> None:
    """release.go:178-211: parse the table from the topic, format, post —
    and swallow (log) transport failures; a None notifier is a no-op."""
    if notifier is None:
        return
    from tipoca_stream_spark.functions.mask_diff import parse_topic

    _, _, table = parse_topic(topic)
    try:
        notifier.notify(
            release_message(schema, table, repo, file_path, current_version, desired_version)
        )
    except Exception as err:  # noqa: BLE001 — release must not fail on notify
        log.error("release notification failed, err: %s", err)
