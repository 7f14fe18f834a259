"""Per-interval stage-metric capture for the bench harnesses
(VERDICT r8 #6): wall time alone can hide a scale-killer that still
fits in 128 GiB, so the bench artifacts also carry shuffle-read/write
and spill bytes per query, letting a 10x-data rehearsal flag any query
whose SHUFFLE grows superlinearly even when its wall time stays inside
the gate.

Reads the driver's AppStatusStore via py4j (the UI/REST API is disabled
in the bench sessions). Attribution is by stage-id watermark: queries
run strictly sequentially in these harnesses, so every stage completed
since the previous snapshot belongs to the query just materialized.
Caveat: the status store retains spark.ui.retainedStages (default 1000)
stages — a single query emitting more than that undercounts; across
queries the watermark makes eviction harmless.
"""

from __future__ import annotations


class StageMetricsTracker:
    """Snapshot-to-snapshot sums of stage metrics for one SparkSession."""

    FIELDS = (
        "shuffle_read_bytes",
        "shuffle_write_bytes",
        "memory_spill_bytes",
        "disk_spill_bytes",
        "input_bytes",
    )

    def __init__(self, spark) -> None:
        sc = spark.sparkContext
        self._jss = sc._jsc.sc().statusStore()
        self._empty = sc._jvm.java.util.ArrayList()
        self._quantiles = sc._gateway.new_array(sc._jvm.double, 0)
        self._watermark = -1
        self.snapshot()  # consume warmup/startup stages

    def _stages(self):
        seq = self._jss.stageList(
            self._empty, False, False, self._quantiles, self._empty
        )
        it = seq.iterator()
        while it.hasNext():
            yield it.next()

    def snapshot(self) -> dict[str, int]:
        """Metrics of all stages newer than the previous snapshot;
        advances the watermark."""
        tot = dict.fromkeys(self.FIELDS, 0)
        new_mark = self._watermark
        for st in self._stages():
            sid = st.stageId()
            if sid <= self._watermark:
                continue
            new_mark = max(new_mark, sid)
            tot["shuffle_read_bytes"] += st.shuffleReadBytes()
            tot["shuffle_write_bytes"] += st.shuffleWriteBytes()
            tot["memory_spill_bytes"] += st.memoryBytesSpilled()
            tot["disk_spill_bytes"] += st.diskBytesSpilled()
            tot["input_bytes"] += st.inputBytes()
        self._watermark = new_mark
        return tot
