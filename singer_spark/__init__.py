"""singer_spark — a PySpark-native rebuild of pinterest/singer's capabilities.

The reference (/root/reference, pinterest/singer) is a log-ingestion agent:
it tails rotating log files, frames them into messages (Thrift-framed binary
or regex-delimited text), transforms/filters/samples/audits them, and
delivers them at-least-once to Kafka / S3 / Pulsar.  This package re-expresses
that pipeline Spark-first:

- ``sources``      file sources (text / framed-thrift binary), batch + streaming
- ``framing``      Thrift LogMessage codec + multi-line text framer
- ``transforms``   per-record transforms T1-T11 (SURVEY.md §2.3)
- ``partitioners`` Kafka partitioner library P1-P10 as column expressions (§2.5)
- ``sinks``        Kafka / file / noop / memory sinks + audit side-channel (§2.6)
- ``audit``        per-batch AuditMessage protocol (§2.4 B5)
- ``heartbeat``    SingerStatus heartbeat from streaming progress (§2.4 B6)
- ``engine``       pipeline manager: start / drain / stop (§2.2 D1-D2)
- ``config``       SingerLogConfig-subset dataclasses + properties loader (§2.8 O4)

Beyond reference parity, ``operators/`` adds the large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) and ``queries.py`` the relational analytics surface, all designed
for 100 TB scale: built-in JVM expressions in the hot path, broadcast joins
for small dims, AQE-friendly shuffles, no row-at-a-time Python UDFs.
"""

__version__ = "0.1.0"

from singer_spark.session import get_spark  # noqa: F401
