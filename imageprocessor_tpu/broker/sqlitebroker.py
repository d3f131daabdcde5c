"""Durable SQLite-backed broker.

Provides the reference's Kafka delivery contract — partitioned topics,
consumer groups, at-least-once commit-after-success (reference:
internal/broker/kafka/consumer.go, worker.go:125-146) — on a single file,
so the full async pipeline runs with zero external services. Redelivery is
lease-based per message, which is strictly stronger than the reference's
offset commits: its latestOffset race (consumer.go:33-44, documented in
SURVEY.md §5) cannot occur here because acks are keyed by a unique
delivery token, not a shared offset watermark.

Ordering: delivery order within a partition is offset order, but
CONCURRENT consumers (or one consumer's parallel batch) may complete
out of order — identical to the reference, whose WORKER_CONCURRENCY
goroutines process same-partition messages concurrently (worker.go:
88-96). The service keys one task per image, so per-image ordering is
vacuous in production; producers enqueueing multiple ordered messages
per key must serialize consumption themselves.
"""

from __future__ import annotations

import sqlite3
import threading
import time
import uuid

from imageprocessor_tpu.broker.base import Broker, BrokerMessage, partition_for_key

_SCHEMA = """
CREATE TABLE IF NOT EXISTS topics (
    name TEXT PRIMARY KEY,
    partitions INTEGER NOT NULL
);
CREATE TABLE IF NOT EXISTS messages (
    topic TEXT NOT NULL,
    partition INTEGER NOT NULL,
    offset INTEGER NOT NULL,
    key BLOB,
    value BLOB NOT NULL,
    created_at REAL NOT NULL,
    PRIMARY KEY (topic, partition, offset)
);
CREATE TABLE IF NOT EXISTS deliveries (
    topic TEXT NOT NULL,
    partition INTEGER NOT NULL,
    offset INTEGER NOT NULL,
    grp TEXT NOT NULL,
    state TEXT NOT NULL DEFAULT 'leased',   -- leased | done
    token TEXT NOT NULL,
    lease_until REAL NOT NULL,
    lease_len REAL NOT NULL DEFAULT 0,      -- granted duration (clock guard)
    PRIMARY KEY (topic, partition, offset, grp)
);
CREATE INDEX IF NOT EXISTS idx_deliveries_grp
    ON deliveries(grp, topic, state, lease_until);
CREATE TABLE IF NOT EXISTS offsets (
    topic TEXT NOT NULL,
    partition INTEGER NOT NULL,
    next_off INTEGER NOT NULL,
    PRIMARY KEY (topic, partition)
);
"""


class SQLiteBroker(Broker):
    def __init__(self, path: str, default_partitions: int = 3):
        if path != ":memory:":
            import os
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._lock = threading.Lock()
        self._default_partitions = default_partitions
        with self._lock:
            self._conn.execute("PRAGMA journal_mode=WAL")
            self._conn.execute("PRAGMA synchronous=NORMAL")
            self._conn.executescript(_SCHEMA)
            try:
                # legacy databases created before the clock-guard column
                self._conn.execute("ALTER TABLE deliveries"
                                   " ADD COLUMN lease_len REAL"
                                   " NOT NULL DEFAULT 0")
            except sqlite3.OperationalError:
                pass  # column already exists
            self._conn.commit()

    def create_topic(self, topic: str, partitions: int = 3) -> None:
        with self._lock:
            self._conn.execute(
                "INSERT OR IGNORE INTO topics (name, partitions) VALUES (?,?)",
                (topic, partitions))
            self._conn.commit()

    def _partitions(self, topic: str) -> int:
        row = self._conn.execute(
            "SELECT partitions FROM topics WHERE name = ?", (topic,)).fetchone()
        if row:
            return row[0]
        self._conn.execute(
            "INSERT OR IGNORE INTO topics (name, partitions) VALUES (?,?)",
            (topic, self._default_partitions))
        return self._default_partitions

    def produce(self, topic: str, key: bytes, value: bytes) -> BrokerMessage:
        with self._lock:
            p = partition_for_key(key, self._partitions(topic))
            # Offsets come from a MONOTONIC persistent counter, never
            # MAX(offset) over surviving rows: after retention purges a
            # fully-acked partition, MAX() would restart at 0 and the
            # reused (topic, partition, offset) key would join against
            # the purged era's 'done' delivery row — making the new
            # message silently undeliverable.
            self._conn.execute(
                "INSERT INTO offsets (topic, partition, next_off)"
                " VALUES (?,?,COALESCE((SELECT MAX(offset) + 1 FROM messages"
                "   WHERE topic = ? AND partition = ?), 0))"
                " ON CONFLICT (topic, partition) DO NOTHING",
                (topic, p, topic, p))
            row = self._conn.execute(
                "UPDATE offsets SET next_off = next_off + 1"
                " WHERE topic = ? AND partition = ?"
                " RETURNING next_off - 1", (topic, p)).fetchone()
            offset = row[0]
            created_at = time.time()
            self._conn.execute(
                "INSERT INTO messages (topic, partition, offset, key, value,"
                " created_at) VALUES (?,?,?,?,?,?)",
                (topic, p, offset, key, value, created_at))
            self._conn.commit()
        return BrokerMessage(topic=topic, partition=p, offset=offset,
                             key=key, value=value,
                             enqueued_at=created_at)

    def poll(self, topic: str, group: str, max_n: int = 1,
             lease_s: float = 60.0) -> list[BrokerMessage]:
        now = time.time()
        out: list[BrokerMessage] = []
        with self._lock:
            rows = self._conn.execute(
                """
                SELECT m.partition, m.offset, m.key, m.value, m.created_at
                FROM messages m
                LEFT JOIN deliveries d
                  ON d.topic = m.topic AND d.partition = m.partition
                 AND d.offset = m.offset AND d.grp = ?
                WHERE m.topic = ?
                  AND (d.state IS NULL
                       OR (d.state = 'leased' AND (d.lease_until < ?
                       -- wall-clock leases must survive restarts (the
                       -- DB outlives the process and CLOCK_MONOTONIC
                       -- resets at boot), but a backwards NTP step then
                       -- over-extends every lease by the step size: a
                       -- lease further in the future than ITS OWN
                       -- granted duration (+5 min tolerance; the
                       -- current poll's lease_s covers legacy rows with
                       -- no recorded duration) is a clock anomaly ->
                       -- treat as expired (premature redelivery is safe
                       -- under at-least-once).
                           OR d.lease_until > ? + MAX(d.lease_len, ?) + 300)))
                ORDER BY m.created_at, m.partition, m.offset
                LIMIT ?
                """, (group, topic, now, now, lease_s, max_n)).fetchall()
            for p, offset, key, value, created_at in rows:
                token = uuid.uuid4().hex
                self._conn.execute(
                    "INSERT INTO deliveries (topic, partition, offset, grp,"
                    " state, token, lease_until, lease_len)"
                    " VALUES (?,?,?,?,'leased',?,?,?)"
                    " ON CONFLICT (topic, partition, offset, grp) DO UPDATE"
                    " SET token = excluded.token,"
                    "     lease_until = excluded.lease_until,"
                    "     lease_len = excluded.lease_len,"
                    "     state = 'leased'",
                    (topic, p, offset, group, token, now + lease_s, lease_s))
                out.append(BrokerMessage(topic=topic, partition=p,
                                         offset=offset, key=key or b"",
                                         value=value, token=token,
                                         enqueued_at=created_at))
            if rows:
                self._conn.commit()
        return out

    def ack(self, msg: BrokerMessage) -> bool:
        with self._lock:
            cur = self._conn.execute(
                "UPDATE deliveries SET state = 'done'"
                " WHERE topic = ? AND partition = ? AND offset = ?"
                "   AND token = ? AND state = 'leased'",
                (msg.topic, msg.partition, msg.offset, msg.token))
            self._conn.commit()
            return cur.rowcount > 0

    def nack(self, msg: BrokerMessage) -> None:
        with self._lock:
            self._conn.execute(
                "UPDATE deliveries SET lease_until = 0"
                " WHERE topic = ? AND partition = ? AND offset = ?"
                "   AND token = ? AND state = 'leased'",
                (msg.topic, msg.partition, msg.offset, msg.token))
            self._conn.commit()

    def depth(self, topic: str, group: str) -> int:
        with self._lock:
            row = self._conn.execute(
                """
                SELECT COUNT(*)
                FROM messages m
                LEFT JOIN deliveries d
                  ON d.topic = m.topic AND d.partition = m.partition
                 AND d.offset = m.offset AND d.grp = ?
                WHERE m.topic = ? AND (d.state IS NULL OR d.state != 'done')
                """, (group, topic)).fetchone()
            return row[0]

    def purge_done(self, older_than_s: float = 3600.0,
                   unconsumed_ttl_s: float = 7 * 86400.0) -> int:
        """Garbage-collect messages (retention).

        Two tiers, mirroring Kafka segment retention:
        * acked tier: messages older than `older_than_s` that EVERY
          group active on the topic has acked (a group with any
          delivery history on the topic but none for this message is
          lagging, not absent — it vetoes; a group that has never
          polled the topic at all cannot veto, same as a Kafka group
          that never subscribed);
        * retention tier: ANY message older than `unconsumed_ttl_s`
          (Kafka's log.retention default is 7 days) — bounds growth of
          topics nobody consumes (e.g. the results topic when no
          downstream is attached).

        Delivery rows of purged messages are deleted with them.
        """
        now = time.time()
        with self._lock:
            cur = self._conn.execute(
                """
                DELETE FROM messages
                WHERE (created_at < ?
                  AND EXISTS (
                    SELECT 1 FROM deliveries d2
                    WHERE d2.topic = messages.topic
                      AND d2.partition = messages.partition
                      AND d2.offset = messages.offset)
                  AND NOT EXISTS (
                    -- any group active on this TOPIC that has not
                    -- acked THIS message vetoes (lagging consumer)
                    SELECT 1 FROM (
                      SELECT DISTINCT grp FROM deliveries dt
                      WHERE dt.topic = messages.topic) g
                    WHERE NOT EXISTS (
                      SELECT 1 FROM deliveries dd
                      WHERE dd.topic = messages.topic
                        AND dd.partition = messages.partition
                        AND dd.offset = messages.offset
                        AND dd.grp = g.grp
                        AND dd.state = 'done')))
                  OR created_at < ?
                """, (now - older_than_s, now - unconsumed_ttl_s))
            self._conn.execute(
                """
                DELETE FROM deliveries
                WHERE NOT EXISTS (
                  SELECT 1 FROM messages m
                  WHERE m.topic = deliveries.topic
                    AND m.partition = deliveries.partition
                    AND m.offset = deliveries.offset)
                """)
            self._conn.commit()
            return cur.rowcount

    def close(self) -> None:
        with self._lock:
            self._conn.close()
