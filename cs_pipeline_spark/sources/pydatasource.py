"""Custom Python DataSource (Spark 4 DataSource API) — SURVEY §2.1
extension.

The reference's ingestion boundary is bespoke downloaders
(`/root/reference/pipeline/carbonpipeline/api_request.py:47-118`,
`downloader.py:52-105`) that fetch then hand files to the engine. The
Spark-4-native shape is a *custom data source*: the fetch/decode logic
lives behind ``spark.read.format("...")`` with partition planning, so
the engine parallelizes, prunes, and retries it like any other scan —
no driver-side download loop.

``StationObsDataSource`` is a deterministic synthetic station-
observation feed (the CDS/AmeriFlux stand-in): N partitions × M rows,
every value pure integer arithmetic on (partition, row) — so the
oracle can state the identical rows in SQL and the scan parallelism
is REAL (one reader per partition, executor-side).

100 TB design: a production source implements ``partitions()`` from
the remote catalog (one partition per file/chunk/date), so a
1000-executor cluster fans the fetch out; ``read(partition)`` yields
Arrow-friendly tuples and never materializes the whole feed in one
process. Schema is declared up front → column pruning works; a
predicate-pushdown filter() hook can prune partitions server-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from cs_pipeline_spark.registry import register

N_STATIONS = 8  # one partition per station
ROWS_PER_STATION = 500


class _StationPartition(InputPartition):
    def __init__(self, station_id: int):
        self.station_id = station_id


class StationObsReader(DataSourceReader):
    def partitions(self):
        return [_StationPartition(i) for i in range(N_STATIONS)]

    def read(self, partition: _StationPartition):
        s = partition.station_id
        for r in range(ROWS_PER_STATION):
            # pure integer arithmetic — reproducible anywhere
            t_centi = 1500 + ((s * 37 + r * 13) % 400)  # 15.00–18.99 °C
            rh_centi = 3000 + ((s * 11 + r * 7) % 6000)  # 30–90 %
            yield (s, r, t_centi, rh_centi)


class StationObsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "station_obs"

    def schema(self) -> str:
        return (
            "station_id int, obs_idx int, temp_centi int, rh_centi int"
        )

    def reader(self, schema) -> DataSourceReader:
        return StationObsReader()

    def simpleStreamReader(self, schema):
        return StationObsStreamReader()


@register(
    "source_python_datasource",
    f"""
    WITH obs AS (
      SELECT s.i AS station_id, r.i AS obs_idx,
             1500 + ((s.i * 37 + r.i * 13) % 400) AS temp_centi,
             3000 + ((s.i * 11 + r.i * 7) % 6000) AS rh_centi
      FROM range({N_STATIONS}) s(i), range({ROWS_PER_STATION}) r(i)
    )
    SELECT CAST(station_id AS INTEGER) AS station_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(temp_centi) AS BIGINT) AS sum_temp_centi,
           CAST(MIN(rh_centi) AS INTEGER) AS min_rh_centi,
           CAST(MAX(rh_centi) AS INTEGER) AS max_rh_centi
    FROM obs GROUP BY station_id
    """,
    doc="custom Python DataSource (Spark 4 API): partition-planned "
    "synthetic station feed read via spark.read.format, aggregated — "
    "the engine-native shape of the reference's bespoke downloaders",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register + scan the custom source, then aggregate per station.

    The aggregation proves the rows arrived with the declared schema
    and partition layout (8 parallel readers — check
    ``df.rdd.getNumPartitions()``); integer sums keep the oracle
    exact. sf_dir is unused: the source IS the data (like a remote
    API), which is the point of the exercise.
    """
    from pyspark.sql import functions as F

    try:
        spark.dataSource.register(StationObsDataSource)
    except Exception:
        pass  # already registered in this session
    obs = spark.read.format("station_obs").load()
    return obs.groupBy("station_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("temp_centi").cast("long").alias("sum_temp_centi"),
        F.min("rh_centi").alias("min_rh_centi"),
        F.max("rh_centi").alias("max_rh_centi"),
    )


# ---------- streaming side of the same source ----------

STREAM_ROWS_PER_BATCH = 1000  # micro-batch span in obs_idx units
STREAM_TOTAL = N_STATIONS * ROWS_PER_STATION


def _rows_between(start: int, end: int):
    """Deterministic row block [start, end) in global obs order —
    shared by live reads and recovery replays, so a restarted query
    reproduces byte-identical micro-batches."""
    for g in range(start, end):
        s, r = divmod(g, ROWS_PER_STATION)
        t_centi = 1500 + ((s * 37 + r * 13) % 400)
        rh_centi = 3000 + ((s * 11 + r * 7) % 6000)
        yield (s, r, t_centi, rh_centi)


class StationObsStreamReader(SimpleDataSourceStreamReader):
    """Offset = one integer cursor over the global obs order.

    ``read(start)`` serves the next bounded span and advances the
    cursor; ``readBetweenOffsets`` replays any committed span exactly
    (pure function of the offsets) — the recovery contract that makes
    checkpoint restarts exactly-once.
    """

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start):
        lo = start["idx"]
        hi = min(lo + STREAM_ROWS_PER_BATCH, STREAM_TOTAL)
        # iter(list): the runner advances it (needs an iterator) AND
        # pickles the prefetched block (needs picklability — a plain
        # generator fails, a list-iterator satisfies both)
        return iter(list(_rows_between(lo, hi))), {"idx": hi}

    def readBetweenOffsets(self, start, end):
        return _rows_between(start["idx"], end["idx"])


