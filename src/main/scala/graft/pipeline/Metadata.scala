package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.AttrsMeta

/** The metadataexporter analogue
  * (`exporter/metadataexporter/attribute_writer.go:38-100`,
  * `exporter.go:506-521` removeDuplicateRecords): per log record, one
  * attributes-metadata row keyed by 6-hour window:
  *
  *   (rounded_unix_milli, data_source, resource_fingerprint,
  *    attr_fingerprint, resource_attrs, attrs)
  *
  * where both fingerprints are FNV-1a over the name-sorted flattened
  * attribute sets (hash.go FingerprintHash — NOT the hierarchy-labeled
  * logs_v2 fingerprint), the stored maps keep only string-valued attributes
  * (exporter.go flattenJSONToStringMap), and rows are deduplicated on the
  * fingerprint pair like removeDuplicateRecords. The reference's rounded
  * window uses wall-clock receive time; this engine derives it from the
  * record timestamp for determinism (same policy as the tag sinks).
  *
  * Cross-batch suppression (the keyCache existence check) is the same
  * anti-join pattern as [[Exporter.resources]]: pass `existing` to skip
  * already-written (resource_fp, attr_fp) pairs.
  */
object Metadata {
  val sixHoursMs: Long = 6L * 3600 * 1000

  def attributesMetadata(
      logsV2: DataFrame,
      skipKeys: Set[String] = Set.empty,
      existing: Option[DataFrame] = None): DataFrame = {
    val skip = skipKeys.toSeq.sorted
    val rows = logsV2
      .withColumn("rounded_unix_milli",
        expr(s"((timestamp div 1000000) div $sixHoursMs) * $sixHoursMs"))
      .withColumn("__res", AttrsMeta.of(
        col("resources_string"),
        map().cast(graft.model.LogSchema.mapSD),
        map().cast(graft.model.LogSchema.mapSB), skip))
      .withColumn("__att", AttrsMeta.of(
        col("attributes_string"), col("attributes_number"), col("attributes_bool"),
        skip))
      .select(
        col("rounded_unix_milli"),
        lit("logs").as("data_source"),
        col("__res.fprint").as("resource_fingerprint"),
        col("__att.fprint").as("attr_fingerprint"),
        col("__res.attrs").as("resource_attrs"),
        col("__att.attrs").as("attrs"))
      .dropDuplicates("rounded_unix_milli", "resource_fingerprint", "attr_fingerprint")
    existing match {
      case Some(e) => rows.join(
        e.select("rounded_unix_milli", "resource_fingerprint", "attr_fingerprint"),
        Seq("rounded_unix_milli", "resource_fingerprint", "attr_fingerprint"), "left_anti")
      case None => rows
    }
  }
}
