"""G4 — SSE-style continuous read: each message rendered as an
``id:``/``data:`` frame pushed to a per-client callback.

Reference parity (src/route/handlers.go:188-237): at-MOST-once — the
reference Acks *before* writing the frame to the client (:227-231), so a
dropped client loses in-flight messages. Here the foreachBatch callback
swallows client errors (frames for a dead client are dropped, the batch
still commits) which reproduces that guarantee; contrast delivery.py
which raises to force redelivery (at-least-once).

Subscription-name semantics (G6): a NonResumable* auto-name maps to a
fresh throwaway checkpoint (unsubscribe-on-exit ≙ delete dir); a user
name >= 5 chars maps to a stable checkpoint dir (resumable).
"""

from __future__ import annotations

import secrets
from collections.abc import Callable

from pyspark.sql import DataFrame


def gen_subscription_name() -> str:
    """Auto-name parity: NonResumable<rand24> (src/model/topic.go:94)."""
    return "NonResumable" + secrets.token_hex(12)


def consumer_params(
    subscription_name: str = "",
    subscription_type: str = "",
    initial_position: str = "",
) -> tuple[str, str, str]:
    """Resolve (name, type, position) the way the reference's
    ConsumerParams does (src/route/handlers.go:440-461): empty name ->
    auto NonResumable*, else the user name must be >4 chars — this is the
    ONLY place the 5-char rule applies (webhook-config validation merely
    requires non-empty, src/model/topic.go:164)."""
    from ..model.topic import get_initial_position, get_subscription_type

    sub_type = get_subscription_type(subscription_type)
    init_pos = get_initial_position(initial_position)
    if not subscription_name:
        return gen_subscription_name(), sub_type, init_pos
    if len(subscription_name) < 5:
        raise ValueError("subscription name must be more than 4 characters")
    return subscription_name, sub_type, init_pos


def sse_frame(message_id: str, payload: bytes | None) -> str:
    body = (payload or b"").decode("utf-8", errors="replace")
    return f"id: {message_id}\ndata: {body}\n\n"


def sse_stream(
    stream: DataFrame,
    client: Callable[[str], None],
    checkpoint_dir: str,
    query_name: str = "sse",
):
    def handle(df: DataFrame, _epoch: int) -> None:
        # (event_time, message_id) order WITHIN the micro-batch: a plain
        # collect would emit frames in partition order, interleaving a
        # multi-partition batch; the sort is batch-bounded (the same
        # bound as the collect itself) and matches the delivery order of
        # the reference's single consumer loop (handlers.go:212-231).
        rows = (
            df.select("message_id", "payload", "event_time")
            .orderBy("event_time", "message_id")
            .collect()
        )
        for r in rows:
            try:
                client(sse_frame(r["message_id"], r["payload"]))
            except Exception:
                # client gone: frames drop, batch still commits (at-most-once)
                return

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
