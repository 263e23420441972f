"""Alerting / replication-lag monitoring — thresholds evaluated as data.

Reference semantics (studied, not copied):
- AlertIfSlotLag: flow/alerting/alerting.go:124-184 — slot lag (MB) compared
  against per-rule thresholds (threshold <= 0 disables a rule); evaluation
  short-circuits unless lag exceeds the LOWEST enabled threshold.
- AlertIfOpenConnections: flow/alerting/alerting.go:186-241.
- AlertIfTooLongSinceLastNormalize: flow/alerting/alerting.go:243-283.
- Alert dedup: flow/alerting/alerting.go:293-340 (checkAndAddAlertToCatalog) —
  an alert with the same (key, rule) is suppressed when one was already
  recorded within the alerting gap (default 15 min); raised alerts persist in
  the catalog (peerdb_stats.alerts_v1), they are data, not just messages.
- Slot metrics history: flow/connectors/utils/monitoring/monitoring.go
  (AppendSlotSizeInfo → peerdb_stats.peer_slot_size, one gauge row per
  observation, queryable for lag-over-time).
- Rule scoping: AlertSenderConfig.AlertForMirrors — empty list means all
  mirrors (flow/alerting/alerting.go:157-163).

Spark-first shape: alerting state is control-plane metadata — O(mirrors +
observations) rows, never O(data) — so it lives in the driver-side JSON
catalog next to the rest of the mirror state, and every surface is ALSO
exposed as a DataFrame (`alerts_df`, `lag_metrics_df`) so lag dashboards are
ordinary Spark queries. Senders (slack/email/pagers) are deliberately out of
scope (no network in scope; the reference's senders are thin POST wrappers) —
a raised alert IS a catalog row.
"""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

from peerdb_spark.registry import Catalog


@dataclass(frozen=True)
class SlotInfo:
    """Replication-slot gauge (mirror of protos.SlotInfo — slot name, LSNs,
    lag in MB; ref: flow/connectors/postgres/client.go GetSlotInfo)."""

    slot_name: str
    lag_mb: float
    confirmed_flush_lsn: str = ""
    restart_lsn: str = ""
    wal_status: str = ""


@dataclass(frozen=True)
class AlertRule:
    """One threshold rule. kind: 'slot_lag_mb' | 'open_connections' |
    'normalize_interval_minutes'. threshold <= 0 disables the rule (the
    reference's convention for getSlotLagMBAlertThreshold() == 0).
    alert_for_mirrors empty = applies to every mirror."""

    rule_id: str
    kind: str
    threshold: float
    alert_for_mirrors: tuple[str, ...] = field(default=())

    def applies_to(self, mirror: str) -> bool:
        return not self.alert_for_mirrors or mirror in self.alert_for_mirrors


class Alerter:
    """Evaluate alert rules against observed gauges; persist breaches.

    `now` is injectable for deterministic tests (the reference reaches for
    the DB clock; a clock parameter is the honest equivalent)."""

    def __init__(
        self,
        catalog: Catalog,
        rules: list[AlertRule],
        gap_minutes: float = 15.0,
        now=time.time,
    ):
        self.catalog = catalog
        self.rules = rules
        self.gap_minutes = gap_minutes
        self.now = now

    # -- internal ----------------------------------------------------------
    def _enabled(self, kind: str, mirror: str) -> list[AlertRule]:
        return [
            r
            for r in self.rules
            if r.kind == kind and r.threshold > 0 and r.applies_to(mirror)
        ]

    def _raise(self, mirror: str, rule: AlertRule, alert_key: str, message: str) -> bool:
        """Dedup within the alerting gap, then persist (alerting.go:293-340)."""
        ts = self.now()
        last = self.catalog.last_alert_ts(mirror, alert_key, rule.rule_id)
        if last is not None and (ts - last) < self.gap_minutes * 60.0:
            return False
        self.catalog.record_alert(mirror, alert_key, message, rule.rule_id, ts)
        return True

    # -- rule surfaces (one per reference AlertIf*) ------------------------
    def alert_if_slot_lag(self, mirror: str, slot: SlotInfo) -> list[dict]:
        """Record the slot gauge, then raise per-rule breaches
        (alerting.go:124-184). Always records the observation — lag history
        is a monitoring table even when no threshold is breached."""
        self.catalog.record_slot_metrics(mirror, asdict(slot), self.now())
        rules = self._enabled("slot_lag_mb", mirror)
        if not rules or slot.lag_mb <= min(r.threshold for r in rules):
            return []  # below the lowest enabled threshold: nothing to do
        raised = []
        for r in rules:
            if slot.lag_mb > r.threshold:
                key = f"slot-lag:{mirror}:{slot.slot_name}"
                msg = (
                    f"Slot `{slot.slot_name}` on mirror `{mirror}` has lag "
                    f"{slot.lag_mb:.1f}MB, above threshold {r.threshold:g}MB"
                )
                if self._raise(mirror, r, key, msg):
                    raised.append({"rule_id": r.rule_id, "alert_key": key})
        return raised

    def alert_if_open_connections(self, mirror: str, n_open: int) -> list[dict]:
        """alerting.go:186-241."""
        raised = []
        for r in self._enabled("open_connections", mirror):
            if n_open > r.threshold:
                key = f"open-connections:{mirror}"
                msg = (
                    f"{n_open} open connections for mirror `{mirror}`, above "
                    f"threshold {r.threshold:g}"
                )
                if self._raise(mirror, r, key, msg):
                    raised.append({"rule_id": r.rule_id, "alert_key": key})
        return raised

    def alert_if_too_long_since_last_normalize(
        self, mirror: str, interval_seconds: float | None = None
    ) -> list[dict]:
        """alerting.go:243-283. When interval_seconds is None it is computed
        from the catalog's last-normalize timestamp (recorded by the CDC
        executor after each normalize)."""
        if interval_seconds is None:
            last = self.catalog.get_last_normalize_ts(mirror)
            if last is None:
                return []
            interval_seconds = self.now() - last
        raised = []
        for r in self._enabled("normalize_interval_minutes", mirror):
            if interval_seconds > r.threshold * 60.0:
                key = f"normalize-stalled:{mirror}"
                msg = (
                    f"No normalize on mirror `{mirror}` for "
                    f"{interval_seconds:.0f}s (threshold {r.threshold:g}m) — "
                    f"pipeline stall or idle source"
                )
                if self._raise(mirror, r, key, msg):
                    raised.append({"rule_id": r.rule_id, "alert_key": key})
        return raised


# -- lag gauges from sync state (data-plane view) ---------------------------


def lag_snapshot(
    catalog: Catalog, mirror: str, current_source_checkpoint=None
) -> dict:
    """Per-mirror replication-lag gauges from the batch-metrics history.

    slot_lag = max source checkpoint − last synced end-checkpoint: what the
    reference derives from pg_current_wal_lsn − confirmed_flush_lsn
    (flow/connectors/postgres/client.go slot-size query); here checkpoints
    are the engine's LSN equivalents and the caller supplies the source's
    current head (it is a source-side observable, not catalog state)."""
    rows = catalog.batch_metrics(mirror)
    his = [r["end_checkpoint"] for r in rows if r.get("end_checkpoint") is not None]
    last_ck = max(his) if his else None
    slot_lag = None
    if current_source_checkpoint is not None and last_ck is not None:
        try:
            slot_lag = current_source_checkpoint - last_ck
        except TypeError:  # opaque string offsets have no distance metric
            slot_lag = None
    return {
        "mirror": mirror,
        "last_batch_id": max((r["batch_id"] for r in rows), default=None),
        "last_synced_checkpoint": last_ck,
        "current_source_checkpoint": current_source_checkpoint,
        "slot_lag": slot_lag,
        "rows_synced": int(sum(r.get("n_rows") or 0 for r in rows)),
    }


def lag_metrics_df(
    spark: SparkSession,
    catalog: Catalog,
    mirrors: list[str],
    current_checkpoints: dict | None = None,
) -> DataFrame:
    """Lag gauges for a set of mirrors as a DataFrame — O(mirrors) driver
    rows, so createDataFrame is the correct (bounded) construction."""
    cur = current_checkpoints or {}
    snaps = [lag_snapshot(catalog, m, cur.get(m)) for m in mirrors]
    return spark.createDataFrame(
        [
            (
                s["mirror"],
                s["last_batch_id"],
                _as_long(s["last_synced_checkpoint"]),
                _as_long(s["current_source_checkpoint"]),
                _as_long(s["slot_lag"]),
                s["rows_synced"],
            )
            for s in snaps
        ],
        "mirror string, last_batch_id long, last_synced_checkpoint long, "
        "current_source_checkpoint long, slot_lag long, rows_synced long",
    )


def alerts_df(spark: SparkSession, catalog: Catalog, mirrors: list[str]) -> DataFrame:
    """Raised alerts as a DataFrame (the queryable alerts_v1 equivalent)."""
    rows = [
        (m, a["alert_key"], a["rule_id"], a["message"], float(a["ts"]))
        for m in mirrors
        for a in catalog.alerts(m)
    ]
    return spark.createDataFrame(
        rows,
        "mirror string, alert_key string, rule_id string, message string, ts double",
    )


def _as_long(v):
    return int(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None
