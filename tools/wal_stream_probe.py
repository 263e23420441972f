"""WAL streaming path probe (SCALING.md "WAL streaming path probe").

Reproducible harness for the r11 ad-hoc probe: N events across S slots,
every slot's events inside ONE protocol-v2 streamed transaction whose
StreamCommit arrives in the SECOND micro-batch — the maximally hostile
shape for the cross-batch carry (half of every slot's rows are buffered
decoder state at the boundary). End-to-end mode drives the real
WalStreamRunner (binary decode → raw sync → normalize) and verifies exact
row counts; decode mode times ONE slot's pure sequential decode in-process
(the cost that dominates the e2e number and parallelizes with #slots).

Usage:
  python tools/wal_stream_probe.py --mode decode --events 100000
  python tools/wal_stream_probe.py --mode e2e --events 400000 --slots 4
"""
from __future__ import annotations

import argparse
import json
import os
import struct
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PG_EPOCH_US = 0  # ts stamping detail irrelevant to throughput


def enc_relation(oid, ns, name, cols, key_cols=()):
    b = (b"R" + struct.pack(">I", oid) + ns.encode() + b"\x00"
         + name.encode() + b"\x00" + struct.pack(">BH", ord("d"), len(cols)))
    for c in cols:
        b += struct.pack(">B", 1 if c in key_cols else 0) + c.encode() + b"\x00"
        b += struct.pack(">Ii", 25, -1)
    return b


def enc_insert_v2(oid, xid, vals):
    b = b"I" + struct.pack(">II", xid, oid) + b"N" + struct.pack(">H", len(vals))
    for v in vals:
        raw = v.encode()
        b += b"t" + struct.pack(">I", len(raw)) + raw
    return b


def slot_messages(slot_idx: int, n_events: int, oid: int = 500):
    """One slot's WAL: relation, StreamStart(xid), n inserts, StreamStop +
    StreamCommit. Returns (first_half, second_half) message lists split
    mid-stream — the batch boundary falls inside the open transaction."""
    xid = 900 + slot_idx
    msgs = [(1, enc_relation(oid, "public", "items", ["id", "v", "w"],
                             key_cols=("id",)))]
    msgs.append((2, b"S" + struct.pack(">IB", xid, 1)))
    for i in range(n_events):
        msgs.append((10 + i, enc_insert_v2(
            oid, xid, [str(slot_idx * 10_000_000 + i), f"v{i}", "x" * 20])))
    half = len(msgs) // 2
    tail = [(10 + n_events, b"E"),
            (11 + n_events, b"c" + struct.pack(">IBQQq", xid, 0, 100, 200,
                                               86400 * 365 * 20 * 10**6))]
    return msgs[:half], msgs[half:] + tail


def run_decode(n_events: int) -> dict:
    from peerdb_spark.sources.pgoutput import PgOutputDecoder

    first, second = slot_messages(0, n_events)
    # warm (interpreter/caches) on a small prefix
    d0 = PgOutputDecoder()
    d0.decode_all(first[:1000], carry=True)
    t0 = time.time()
    dec = PgOutputDecoder()
    out1 = dec.decode_all(first, carry=True)
    state = dec.stream_state()
    blob = json.dumps(state)  # the carry serialization cost, measured
    dec2 = PgOutputDecoder()
    for p in dec.relation_messages.values():
        dec2.replay(p)
    dec2.load_stream_state(json.loads(blob))
    out2 = dec2.decode_all(second, carry=True)
    wall = time.time() - t0
    n = len(out1) + len(out2)
    assert n == n_events, (n, n_events)
    return {"mode": "decode", "events": n_events, "wall_sec": round(wall, 2),
            "events_per_sec": round(n_events / wall), "state_bytes": len(blob)}


def run_e2e(n_events: int, n_slots: int, cpus: int, runs: int = 3) -> dict:
    """Drive the full WalStreamRunner `runs` times in ONE JVM over the same
    feed (fresh raw/checkpoint/destination dirs each run) and report the
    MIN — the bench.py warm_best protocol. Run 1 carries JVM/codegen
    compile (~5-8 s) and the later runs measure the sustained daemon the
    reference's TPS anchor describes; the min also defends the recorded
    number against multi-second host-stall windows (r11 verdict #1)."""
    from peerdb_spark import cdc, get_spark
    from peerdb_spark.storage import ParquetTable
    from peerdb_spark.streaming import WalStreamRunner
    from pyspark.sql import types as T

    spark = get_spark("wal_probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    per_slot = n_events // n_slots
    wd = tempfile.mkdtemp(prefix="wal_probe_")
    wal_dir = os.path.join(wd, "wal")

    rows1, rows2 = [], []
    for s in range(n_slots):
        first, second = slot_messages(s, per_slot)
        rows1 += [(f"slot{s}", lsn, bytes(p)) for lsn, p in first]
        rows2 += [(f"slot{s}", lsn, bytes(p)) for lsn, p in second]
    for chunk_rows in (rows1, rows2):
        spark.createDataFrame(chunk_rows, WalStreamRunner.WAL_SCHEMA) \
            .coalesce(n_slots).write.mode("append").parquet(wal_dir)

    val = T.StructType([T.StructField("id", T.StringType()),
                        T.StructField("v", T.StringType()),
                        T.StructField("w", T.StringType())])
    walls = []
    for run in range(runs):
        rd = os.path.join(wd, f"run{run}")
        runner = WalStreamRunner(
            spark, wal_dir, os.path.join(rd, "ckpt"),
            [cdc.CdcTableConfig("public.items", ["id"], val,
                                os.path.join(rd, "items"), n_buckets=8)],
            os.path.join(rd, "raw"),
            max_files_per_trigger=n_slots,
        )
        t0 = time.time()
        runner.run_available()
        walls.append(round(time.time() - t0, 2))
        got = ParquetTable(spark, os.path.join(rd, "items"),
                           ["id"], 8).read().count()
        assert got == n_events, (got, n_events)
    spark.stop()
    best = min(walls)
    return {"mode": "e2e", "events": n_events, "slots": n_slots,
            "wall_sec": best, "events_per_sec": round(n_events / best),
            "runs": walls}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["decode", "e2e"], default="decode")
    ap.add_argument("--events", type=int, default=100_000)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    a = ap.parse_args()
    if a.mode == "decode":
        print(json.dumps(run_decode(a.events)))
    else:
        print(json.dumps(run_e2e(a.events, a.slots, a.cpus)))


if __name__ == "__main__":
    main()
