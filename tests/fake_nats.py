"""Scripted in-memory fake of the nats-py surface used by
nats_stream_processor_spark.sources.nats_transport.

The container has neither nats-py nor a broker, so the real-transport code
path is unit-tested by installing these module objects into ``sys.modules``
under the names the transport imports lazily (``nats``, ``nats.js``,
``nats.js.api``). The fake reproduces the JetStream behaviors the
transport depends on: per-stream monotonic sequences, subject->stream
routing, Nats-Msg-Id duplicate detection, BY_START_SEQUENCE pull
consumers, and (scriptable) publish timeouts.
"""

from __future__ import annotations

import asyncio
import datetime
import types
from dataclasses import dataclass, field


# ------------------------------------------------------------ api objects


class _Enum:
    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return self.name


@dataclass
class StreamConfig:
    name: str = ""
    subjects: list = field(default_factory=list)
    retention: object = None
    discard: object = None
    max_msgs: int = -1
    max_msgs_per_subject: int = -1
    max_bytes: int = -1
    max_age: int = 0
    storage: object = None
    num_replicas: int = 1
    duplicate_window: int = 0


@dataclass
class ConsumerConfig:
    durable_name: str | None = None
    deliver_policy: object = None
    opt_start_seq: int | None = None
    ack_policy: object = None
    max_deliver: int = -1
    ack_wait: float = 30.0
    max_ack_pending: int = -1
    filter_subject: str | None = None


def _make_api_module():
    api = types.ModuleType("nats.js.api")
    api.StreamConfig = StreamConfig
    api.ConsumerConfig = ConsumerConfig
    api.RetentionPolicy = types.SimpleNamespace(
        LIMITS=_Enum("LIMITS"), INTEREST=_Enum("INTEREST"),
        WORK_QUEUE=_Enum("WORK_QUEUE"))
    api.DiscardPolicy = types.SimpleNamespace(
        OLD=_Enum("OLD"), NEW=_Enum("NEW"))
    api.StorageType = types.SimpleNamespace(
        FILE=_Enum("FILE"), MEMORY=_Enum("MEMORY"))
    api.DeliverPolicy = types.SimpleNamespace(
        ALL=_Enum("ALL"), BY_START_SEQUENCE=_Enum("BY_START_SEQUENCE"),
        NEW=_Enum("NEW"))
    api.AckPolicy = types.SimpleNamespace(
        NONE=_Enum("NONE"), EXPLICIT=_Enum("EXPLICIT"))
    return api


# ---------------------------------------------------------------- broker


def _subject_matches(subject: str, pattern: str | None) -> bool:
    """NATS subject matching with trailing '>' wildcard (the only form the
    engine uses)."""
    if not pattern:
        return True
    if pattern.endswith(".>"):
        return subject.startswith(pattern[:-1])
    return subject == pattern


@dataclass
class StoredMsg:
    subject: str
    data: bytes
    seq: int
    ts: datetime.datetime
    headers: dict


class FakeBroker:
    """Shared server state: streams, messages, scripted failures."""

    def __init__(self):
        self.configs: dict[str, StreamConfig] = {}
        self.messages: dict[str, list[StoredMsg]] = {}
        self.fail_next_publishes = 0  # raise TimeoutError for the next N
        self.publish_attempts = 0

    def add_stream(self, config: StreamConfig):
        if config.name not in self.configs:
            self.configs[config.name] = config
            self.messages[config.name] = []

    def route(self, subject: str) -> str:
        for name, cfg in self.configs.items():
            if any(_subject_matches(subject, p) for p in cfg.subjects):
                return name
        raise Exception(f"no stream matches subject {subject!r}")

    def publish(self, subject: str, data: bytes, headers: dict | None):
        self.publish_attempts += 1
        if self.fail_next_publishes > 0:
            self.fail_next_publishes -= 1
            raise asyncio.TimeoutError("scripted publish timeout")
        stream = self.route(subject)
        msgs = self.messages[stream]
        msg_id = (headers or {}).get("Nats-Msg-Id")
        if msg_id is not None:
            for m in msgs:
                if m.headers.get("Nats-Msg-Id") == msg_id:
                    return types.SimpleNamespace(
                        stream=stream, seq=m.seq, duplicate=True)
        seq = msgs[-1].seq + 1 if msgs else 1
        msgs.append(StoredMsg(
            subject=subject, data=bytes(data), seq=seq,
            ts=datetime.datetime.now(datetime.timezone.utc),
            headers=dict(headers or {})))
        return types.SimpleNamespace(stream=stream, seq=seq, duplicate=False)


# --------------------------------------------------------------- client


class FakeMsg:
    def __init__(self, stored: StoredMsg):
        self.subject = stored.subject
        self.data = stored.data
        self.headers = dict(stored.headers)
        self.metadata = types.SimpleNamespace(
            sequence=types.SimpleNamespace(stream=stored.seq,
                                           consumer=stored.seq),
            timestamp=stored.ts,
            num_delivered=1,
        )


class FakePullSubscription:
    def __init__(self, broker: FakeBroker, stream: str,
                 config: ConsumerConfig):
        self.broker = broker
        self.stream = stream
        self.config = config
        self.unsubscribed = False

    async def fetch(self, batch: int, timeout: float = 5.0):
        start = self.config.opt_start_seq or 1
        out = [
            FakeMsg(m) for m in self.broker.messages.get(self.stream, [])
            if m.seq >= start
            and _subject_matches(m.subject, self.config.filter_subject)
        ][:batch]
        if not out:
            raise asyncio.TimeoutError("no messages")
        return out

    async def unsubscribe(self):
        self.unsubscribed = True


class FakeJetStream:
    def __init__(self, broker: FakeBroker):
        self.broker = broker

    async def stream_info(self, name: str):
        if name not in self.broker.configs:
            raise Exception(f"stream not found: {name}")
        msgs = self.broker.messages[name]
        return types.SimpleNamespace(
            config=self.broker.configs[name],
            state=types.SimpleNamespace(
                last_seq=msgs[-1].seq if msgs else 0,
                messages=len(msgs)))

    async def add_stream(self, config: StreamConfig):
        self.broker.add_stream(config)

    async def pull_subscribe(self, subject: str = "", stream: str = "",
                             config: ConsumerConfig | None = None,
                             durable: str | None = None):
        if stream not in self.broker.configs:
            raise Exception(f"stream not found: {stream}")
        return FakePullSubscription(self.broker, stream,
                                    config or ConsumerConfig())

    async def publish(self, subject: str, payload: bytes,
                      timeout: float = 5.0, headers: dict | None = None):
        return self.broker.publish(subject, payload, headers)


class FakeNC:
    def __init__(self, broker: FakeBroker, servers):
        self.broker = broker
        self.servers = servers
        self.is_connected = True
        self.drained = False

    def jetstream(self):
        return FakeJetStream(self.broker)

    async def drain(self):
        self.drained = True

    async def close(self):
        self.is_connected = False


def make_fake_nats(broker: FakeBroker | None = None):
    """Build (nats_module, broker). Install with:

        monkeypatch.setitem(sys.modules, "nats", mod)
        monkeypatch.setitem(sys.modules, "nats.js", mod.js)
        monkeypatch.setitem(sys.modules, "nats.js.api", mod.js.api)
    """
    broker = broker or FakeBroker()
    mod = types.ModuleType("nats")
    js_mod = types.ModuleType("nats.js")
    js_mod.api = _make_api_module()
    mod.js = js_mod

    async def connect(servers=None, **kw):
        return FakeNC(broker, servers)

    mod.connect = connect
    return mod, broker
