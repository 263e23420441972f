"""Alerting / replication-lag threshold evaluation (alerting.py).

Mirrors the reference's alerter behavior (flow/alerting/alerting.go):
threshold breach -> alert row in the catalog; repeat breach within the
alerting gap -> suppressed; disabled rule (threshold<=0) -> never fires;
mirror-scoped rules fire only for their mirrors."""

from peerdb_spark.alerting import (
    Alerter,
    AlertRule,
    SlotInfo,
    alerts_df,
    lag_metrics_df,
    lag_snapshot,
)
from peerdb_spark.registry import Catalog


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def _alerter(tmp_path, rules, clock=None):
    cat = Catalog(str(tmp_path / "cat"))
    return Alerter(cat, rules, gap_minutes=15, now=clock or FakeClock()), cat


def test_slot_lag_breach_records_alert(tmp_path):
    a, cat = _alerter(
        tmp_path, [AlertRule("r1", "slot_lag_mb", 100.0)]
    )
    raised = a.alert_if_slot_lag("m1", SlotInfo("slot_a", lag_mb=250.0))
    assert [r["rule_id"] for r in raised] == ["r1"]
    rows = cat.alerts("m1")
    assert len(rows) == 1 and "250.0MB" in rows[0]["message"]
    # the gauge was recorded regardless of breach
    assert cat.slot_metrics("m1")[0]["lag_mb"] == 250.0


def test_slot_lag_below_threshold_records_gauge_only(tmp_path):
    a, cat = _alerter(tmp_path, [AlertRule("r1", "slot_lag_mb", 100.0)])
    assert a.alert_if_slot_lag("m1", SlotInfo("slot_a", lag_mb=50.0)) == []
    assert cat.alerts("m1") == []
    assert len(cat.slot_metrics("m1")) == 1


def test_alert_gap_suppresses_repeat_then_reraises(tmp_path):
    clock = FakeClock(1000.0)
    a, cat = _alerter(tmp_path, [AlertRule("r1", "slot_lag_mb", 100.0)], clock)
    assert a.alert_if_slot_lag("m1", SlotInfo("s", 200.0))  # fires
    clock.t += 60  # 1 min later: inside the 15-min gap
    assert a.alert_if_slot_lag("m1", SlotInfo("s", 300.0)) == []
    clock.t += 15 * 60  # past the gap
    assert a.alert_if_slot_lag("m1", SlotInfo("s", 300.0))
    assert len(cat.alerts("m1")) == 2


def test_disabled_and_scoped_rules(tmp_path):
    rules = [
        AlertRule("off", "slot_lag_mb", 0.0),  # threshold<=0 = disabled
        AlertRule("only-m2", "slot_lag_mb", 10.0, alert_for_mirrors=("m2",)),
    ]
    a, cat = _alerter(tmp_path, rules)
    assert a.alert_if_slot_lag("m1", SlotInfo("s", 1e9)) == []
    assert [r["rule_id"] for r in a.alert_if_slot_lag("m2", SlotInfo("s", 20.0))] == [
        "only-m2"
    ]


def test_open_connections_threshold(tmp_path):
    a, _ = _alerter(tmp_path, [AlertRule("c", "open_connections", 5)])
    assert a.alert_if_open_connections("m1", 4) == []
    assert a.alert_if_open_connections("m1", 6)


def test_normalize_staleness_from_catalog_ts(tmp_path):
    clock = FakeClock(10_000.0)
    a, cat = _alerter(
        tmp_path, [AlertRule("n", "normalize_interval_minutes", 30)], clock
    )
    cat.set_last_normalize_ts("m1", 10_000.0 - 29 * 60)  # 29m ago: fine
    assert a.alert_if_too_long_since_last_normalize("m1") == []
    cat.set_last_normalize_ts("m1", 10_000.0 - 31 * 60)  # 31m ago: stalled
    assert a.alert_if_too_long_since_last_normalize("m1")


def test_lag_snapshot_and_dfs(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cat.record_batch_metrics("m1", 1, 100, 0, 500)
    cat.record_batch_metrics("m1", 2, 50, 501, 900)
    snap = lag_snapshot(cat, "m1", current_source_checkpoint=1500)
    assert snap["slot_lag"] == 600 and snap["last_synced_checkpoint"] == 900
    assert snap["rows_synced"] == 150
    df = lag_metrics_df(spark, cat, ["m1"], {"m1": 1500})
    row = df.collect()[0]
    assert row["slot_lag"] == 600 and row["last_batch_id"] == 2
    # opaque string offsets: no numeric distance -> slot_lag is NULL, no crash
    cat.record_batch_metrics("m2", 1, 10, "0/AA", "0/FF")
    assert lag_snapshot(cat, "m2", "0/100")["slot_lag"] is None
    a = Alerter(cat, [AlertRule("r1", "slot_lag_mb", 1.0)], now=FakeClock())
    a.alert_if_slot_lag("m1", SlotInfo("s", 5.0))
    adf = alerts_df(spark, cat, ["m1", "m2"])
    assert adf.count() == 1 and adf.collect()[0]["mirror"] == "m1"


def test_breach_row_appears_when_lag_exceeds_threshold(tmp_path):
    """The round-3 acceptance criterion: a breach row appears in the catalog
    when computed replication lag exceeds a configured threshold."""
    cat = Catalog(str(tmp_path / "cat"))
    cat.record_batch_metrics("m1", 1, 100, 0, 1000)
    snap = lag_snapshot(cat, "m1", current_source_checkpoint=250_000)
    # express checkpoint distance as MB-equivalent (1 unit = 1 byte here)
    lag_mb = snap["slot_lag"] / 1e6
    a = Alerter(cat, [AlertRule("lag", "slot_lag_mb", 0.1)], now=FakeClock())
    raised = a.alert_if_slot_lag("m1", SlotInfo("slot_m1", lag_mb))
    assert raised and cat.alerts("m1")[0]["alert_key"] == "slot-lag:m1:slot_m1"
