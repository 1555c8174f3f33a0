"""Custom sources & sinks (SURVEY §2.1 S4–S7, §2.2 K3/K4).

The reference domain's ingress surface — generator, webhook/HTTP
deliveries, syslog, Kafka — re-expressed on the Spark 4 **Python Data
Source API** (``pyspark.sql.datasource``): pure-Python, no JVM code,
registered per-session with ``spark.dataSource.register`` and then
addressed as ``spark.readStream.format(name)``.

Scale design (100 TB): every source here keeps the driver out of the
data path — the driver handles *offsets only* (a dict per micro-batch);
rows are produced inside executor tasks, one ``InputPartition`` per
parallel slice. Exactly-once falls out of Spark's offset WAL + commit
log as long as ``partitions(start, end)`` is a pure function of the
offset range, which each reader below guarantees.
"""

from .generator import EventGeneratorDataSource, register_generator  # noqa: F401
from .spool import SpoolDataSource, register_spool  # noqa: F401
from .kafka import kafka_source_options, kafka_sink_options, kafka_reader, kafka_writer  # noqa: F401
from .syslog import parse_syslog, syslog_socket_stream, SYSLOG_FIELDS  # noqa: F401
from .es_sink import EsBulkDataSource, register_es_bulk, bulk_actions  # noqa: F401
