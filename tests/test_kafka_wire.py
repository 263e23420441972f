"""Pure-socket Kafka producer (kafka_wire.py): byte-level protocol tests +
an end-to-end produce from Spark executors to an in-process stub broker —
the Kafka analogue of test_es_delivery's HTTP stub."""

from __future__ import annotations

import socketserver
import struct
import threading

import pytest

from peerdb_spark import kafka_wire as KW


def test_crc32c_standard_check_value():
    """CRC32C('123456789') == 0xE3069283 — the published Castagnoli check
    value — plus agreement with an independent bit-by-bit implementation."""
    assert KW.crc32c(b"123456789") == 0xE3069283

    def bitwise_crc32c(data: bytes) -> int:  # no table, independent
        crc = 0xFFFFFFFF
        for byte in data:
            crc ^= byte
            for _ in range(8):
                crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
        return crc ^ 0xFFFFFFFF

    import random

    rng = random.Random(3)
    for _ in range(20):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        assert KW.crc32c(blob) == bitwise_crc32c(blob)


def test_varint_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(n=st.integers(min_value=-(2**62), max_value=2**62))
    def check(n):
        got, pos = KW.dec_varint(KW.enc_varint(n), 0)
        assert got == n

    check()


def test_record_batch_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blob = st.one_of(st.none(), st.binary(min_size=0, max_size=40))

    header = st.tuples(st.text(alphabet="hk", min_size=0, max_size=4),
                       st.one_of(st.none(), st.binary(max_size=8)))

    @settings(max_examples=50, deadline=None)
    @given(records=st.lists(
        st.tuples(blob, blob, st.lists(header, max_size=3)), min_size=1, max_size=10))
    def check(records):
        assert KW.decode_record_batch(KW.encode_record_batch(records)) == records

    check()


def test_batch_crc_detects_corruption():
    batch = bytearray(KW.encode_record_batch([(b"k", b"v")]))
    batch[-1] ^= 0x01
    with pytest.raises(ValueError, match="crc32c"):
        KW.decode_record_batch(bytes(batch))


class _StubBroker(socketserver.ThreadingTCPServer):
    """Parses Produce v3 frames, records decoded (topic, key, value), and
    answers with a configurable error code."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        self.received: list[tuple[str, bytes | None, bytes | None]] = []
        self.error_code = 0
        self._lock = threading.Lock()
        super().__init__(("127.0.0.1", 0), _StubHandler)


class _StubHandler(socketserver.BaseRequestHandler):
    def handle(self):
        while True:
            head = b""
            while len(head) < 4:
                chunk = self.request.recv(4 - len(head))
                if not chunk:
                    return
                head += chunk
            (n,) = struct.unpack(">i", head)
            frame = b""
            while len(frame) < n:
                frame += self.request.recv(n - len(frame))
            req = KW.decode_produce_request(frame)
            rows = KW.decode_record_batch(req["batch"])
            with self.server._lock:
                self.server.received += [
                    (req["topic"], k, v) for k, v, _h in rows
                ]
                self.server.received_headers = getattr(
                    self.server, "received_headers", []
                ) + [h for _k, _v, h in rows]
            self.request.sendall(
                KW.encode_produce_response(
                    req["correlation_id"], req["topic"], req["partition"],
                    error_code=self.server.error_code,
                )
            )


@pytest.fixture()
def broker():
    b = _StubBroker()
    t = threading.Thread(target=b.serve_forever, daemon=True)
    t.start()
    yield b
    b.shutdown()
    b.server_close()


def test_produce_end_to_end_stub_broker(broker):
    host, port = broker.server_address
    recs = [(b"k1", b'{"a":1}'), (None, b'{"a":2}'), (b"k3", None)]
    KW.produce(host, port, "events", 0, recs)
    assert broker.received == [("events", k, v) for k, v in recs]


def test_produce_raises_on_broker_error(broker):
    broker.error_code = 7  # REQUEST_TIMED_OUT
    host, port = broker.server_address
    with pytest.raises(RuntimeError, match="error_code=7"):
        KW.produce(host, port, "events", 0, [(b"k", b"v")])


def test_spark_executors_deliver_to_stub_broker(spark, broker):
    """The full engine path: changelog → sinks.kafka_rows row contract →
    foreachPartition → wire producer → stub broker, with per-destination
    topic routing — every byte crosses a real socket from executor
    processes."""
    import json

    from pyspark.sql import functions as F

    from peerdb_spark import sinks

    host, port = broker.server_address
    df = spark.createDataFrame(
        [(1, "a", "t1"), (2, "b", "t1"), (3, "c", "t2")],
        "id long, v string, _dst_table string",
    )
    rows = sinks.emit_kafka_rows(
        df.withColumn("_kind", F.lit("insert")), pk_cols=["id"]
    )
    sent = rows.foreachPartition(
        lambda it: KW.deliver_kafka_wire(it, host, port, "fallback")
    )
    got = sorted(
        (t, k.decode(), json.loads(v.decode())["id"])
        for (t, k, v) in broker.received
    )
    assert [t for t, _k, _i in got] == ["t1", "t1", "t2"]
    assert [i for _t, _k, i in got] == [1, 2, 3]


def test_write_kafka_wire_full_sink_path(spark, broker):
    """sinks.write_kafka_wire: contract validation + partitioned wire
    delivery — the connector-less twin of KafkaWriteSpec."""
    import json

    from pyspark.sql import functions as F

    from peerdb_spark import sinks

    host, port = broker.server_address
    df = spark.createDataFrame(
        [(i, f"v{i}", "orders") for i in range(20)],
        "id long, v string, _dst_table string",
    )
    rows = sinks.emit_kafka_rows(df.withColumn("_kind", F.lit("insert")), pk_cols=["id"])
    sinks.write_kafka_wire(rows, host, port)
    ids = sorted(json.loads(v.decode())["id"] for (_t, _k, v) in broker.received)
    assert ids == list(range(20))
    assert {t for t, _k, _v in broker.received} == {"orders"}


def test_deliver_chunks_large_partitions(broker):
    """deliver_kafka_wire splits oversized partitions into multiple produce
    requests (one record batch each) without loss or reorder-within-chunk."""
    host, port = broker.server_address

    class R(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    rows = [R(topic="t", key=str(i).encode(), value=b"v%d" % i) for i in range(2500)]
    n = KW.deliver_kafka_wire(iter(rows), host, port, "fb", chunk=1000)
    assert n == 2500
    assert len(broker.received) == 2500
    keys = [int(k.decode()) for (_t, k, _v) in broker.received]
    assert sorted(keys) == list(range(2500))


def test_deliver_streams_before_iterator_exhausts(broker):
    """The producer flushes full chunks WHILE still consuming the row
    iterator (bounded memory on multi-GB Spark partitions) — a generator
    observes sends happening before it finishes yielding."""
    host, port = broker.server_address

    sent_at: list[int] = []

    def gen():
        for i in range(2000):
            if broker.received:
                sent_at.append(i)
            yield {"topic": "t", "key": str(i).encode(), "value": b"x"}

    n = KW.deliver_kafka_wire(gen(), host, port, "fb", chunk=500)
    assert n == 2000 and len(broker.received) == 2000
    # the first flush happened no later than one chunk past the boundary
    assert sent_at and sent_at[0] <= 501


def test_partition_hash_routing_honored(spark, broker):
    """emit_kafka_rows(num_partitions=N) hash-routes records; the wire
    producer must deliver each record to its computed partition."""
    from pyspark.sql import functions as F

    from peerdb_spark import sinks

    # stub records partitions too
    parts_seen = []
    orig = KW.decode_produce_request

    host, port = broker.server_address
    df = spark.createDataFrame(
        [(i, "t") for i in range(30)], "id long, _dst_table string"
    )
    rows = sinks.emit_kafka_rows(
        df.withColumn("_kind", F.lit("insert")), pk_cols=["id"], num_partitions=4
    )
    expected = {
        r["key"]: r["partition"]
        for r in rows.select("key", "partition").collect()
    }
    assert len(set(expected.values())) > 1  # hash actually spreads

    # wrap the stub's decoder to capture partition ids per record
    import tests.test_kafka_wire as me

    class H2(_StubHandler):
        pass

    broker.RequestHandlerClass = H2  # reuse; capture via received_with_partition
    received_parts = {}

    def capture(frame):
        req = orig(frame)
        for k, _v, _h in KW.decode_record_batch(req["batch"]):
            received_parts[k] = req["partition"]
        return req

    KW_decode = KW.decode_produce_request
    KW.decode_produce_request = capture
    try:
        sinks.write_kafka_wire(rows, host, port)
    finally:
        KW.decode_produce_request = KW_decode
    got = {bytes(k): p for k, p in received_parts.items()}
    want = {bytes(k): p for k, p in expected.items()}
    assert got == want


def test_headers_delivered_end_to_end(spark, broker):
    """Per-record kafka headers flow through emit_kafka_rows → wire encode →
    stub decode byte-exactly (the reference's Lua scripts attach headers)."""
    from pyspark.sql import functions as F

    from peerdb_spark import sinks

    host, port = broker.server_address
    df = spark.createDataFrame([(1, "t")], "id long, _dst_table string")
    rows = sinks.emit_kafka_rows(
        df.withColumn("_kind", F.lit("insert")),
        pk_cols=["id"],
        headers=F.array(
            F.struct(F.lit("src").alias("key"), F.lit(b"pg").alias("value")),
            F.struct(F.lit("empty").alias("key"), F.lit(None).cast("binary").alias("value")),
        ),
    )
    sinks.write_kafka_wire(rows, host, port)
    assert broker.received_headers == [[("src", b"pg"), ("empty", None)]]
