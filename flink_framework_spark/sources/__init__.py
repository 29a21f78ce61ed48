"""Sources, sinks, and the subject catalog.

The reference generates a Kafka source/sink per registered "subject"
(typed stream) and keeps the schema registry in ZooKeeper (SURVEY.md
§1.1 [R]). The Spark-native decomposition:

- ``batch``      bounded sources/sinks (parquet/csv/json; partitioned
                 lake writer with the 100 TB layout discipline)
- ``streaming``  unbounded sources/sinks (file, rate, Kafka when the
                 connector is on the classpath, memory/console/noop)
- ``catalog``    the subject registry: schema-carrying named streams
                 over ``spark.catalog``
"""

from flink_framework_spark.sources.catalog import SubjectRegistry  # noqa: F401
