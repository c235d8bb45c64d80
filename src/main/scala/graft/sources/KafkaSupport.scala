package graft.sources

/** Classpath probe for the Kafka connector.
  *
  * `spark-sql-kafka-0-10` is a separate artifact that is NOT part of
  * the Spark distribution jars — on clusters without it,
  * `format("kafka")` fails only at `load()`/`start()` with an opaque
  * "Failed to find data source: kafka". The probe turns that into a
  * fail-fast, actionable error at wiring time. In THIS build
  * environment the connector is absent by construction (zero-egress
  * image): the Kafka surface is standard wiring verified down to this
  * probe, and the tested ingestion contract is the file-drop /
  * MemoryStream path (see `Files.textStream`, `StreamingSpec`).
  */
object KafkaSupport {

  /** The connector's provider class, present iff spark-sql-kafka is on
    * the classpath. */
  private val ProviderClass = "org.apache.spark.sql.kafka010.KafkaSourceProvider"

  def connectorPresent: Boolean =
    try { Class.forName(ProviderClass, false, getClass.getClassLoader); true }
    catch { case _: ClassNotFoundException => false }

  /** Fail fast (with the fix in the message) when the Kafka connector
    * is missing. Call before building a `format("kafka")` reader or
    * writer. */
  def requireConnector(use: String): Unit =
    if (!connectorPresent)
      throw new IllegalStateException(
        s"$use needs the Kafka connector (spark-sql-kafka-0-10), which is not " +
          "on the classpath. Add the artifact matching your Spark version " +
          "(e.g. --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>), " +
          "or use the file-drop ingestion path (graft.sources.Files.textStream) " +
          "which needs no connector.")
}
