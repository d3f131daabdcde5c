"""Kafka broker backend (client-library gated).

The deployment-scale backend: one consumer-group member per TPU host, the
exact topology of the reference (reference: internal/broker/kafka/
consumer.go:21-27 — group over the 3-partition "image-processing" topic).
This environment ships no Kafka client and has no egress to install one,
so construction raises a clear error; the adapter below documents the
mapping so wiring it to `aiokafka`/`confluent_kafka` is mechanical:

* produce        -> Producer.send(topic, key=key, value=value)
* poll           -> Consumer.poll(max_records=max_n) on a group member
* ack            -> commit the message's offset+1 for its partition; the
                    engine acks per *batch* in partition-offset order, so
                    the watermark semantics stay correct
* nack / lease   -> seek back to the failed offset (redelivery), matching
                    the reference's leave-uncommitted behavior
                    (worker.go:125-146)
"""

from __future__ import annotations

from imageprocessor_tpu.broker.base import Broker, BrokerMessage
from imageprocessor_tpu.errors import MessageQueueError


def _import_client():
    for name in ("confluent_kafka", "aiokafka", "kafka"):
        try:
            return __import__(name)
        except ImportError:
            continue
    return None


class KafkaBroker(Broker):
    def __init__(self, cfg):
        client = _import_client()
        if client is None:
            raise MessageQueueError(
                "kafka broker backend requires confluent_kafka/aiokafka, "
                "neither is installed in this environment; use "
                "BROKER_BACKEND=sqlite (durable) or memory (standalone)")
        # Wiring for a real client would go here; no Kafka client or broker
        # exists in the build/test environment, so this path is exercised
        # only in deployments that provide one.
        raise NotImplementedError(
            "KafkaBroker wiring pending a client library in the runtime "
            "environment")

    def create_topic(self, topic: str, partitions: int = 3) -> None:
        raise NotImplementedError

    def produce(self, topic: str, key: bytes, value: bytes) -> BrokerMessage:
        raise NotImplementedError

    def poll(self, topic: str, group: str, max_n: int = 1,
             lease_s: float = 60.0) -> list[BrokerMessage]:
        raise NotImplementedError

    def ack(self, msg: BrokerMessage) -> bool:
        raise NotImplementedError

    def nack(self, msg: BrokerMessage) -> None:
        raise NotImplementedError

    def depth(self, topic: str, group: str) -> int:
        raise NotImplementedError
