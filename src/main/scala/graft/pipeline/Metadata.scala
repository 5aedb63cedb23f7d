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
      // Dedup happens over SCALAR columns only: a dropDuplicates that
      // carries map payloads plans first(map) aggregates, and any
      // var-length/complex aggregation BUFFER forces SortAggregate (sorts
      // every partition by the group key — measured the slowest projection
      // query in the suite). The fingerprints determine the maps, so
      // distinct() over (keys + canonical-JSON payloads) is the same row
      // set through a pure codegen HashAggregate; the maps re-materialize
      // from the canonical JSON on the deduped rows (codegen kernel too).
      .select(
        col("rounded_unix_milli"),
        col("__res.fprint").as("resource_fingerprint"),
        col("__att.fprint").as("attr_fingerprint"),
        graft.functions.MapSortedJson(col("__res.attrs")).as("__res_json"),
        graft.functions.MapSortedJson(col("__att.attrs")).as("__att_json"))
      .distinct()
      .select(
        col("rounded_unix_milli"),
        lit("logs").as("data_source"),
        col("resource_fingerprint"),
        col("attr_fingerprint"),
        graft.functions.JsonTypedMaps.of(col("__res_json"))
          .getField("strings").as("resource_attrs"),
        graft.functions.JsonTypedMaps.of(col("__att_json"))
          .getField("strings").as("attrs"))
    existing match {
      case Some(e) => rows.join(
        e.select("rounded_unix_milli", "resource_fingerprint", "attr_fingerprint"),
        Seq("rounded_unix_milli", "resource_fingerprint", "attr_fingerprint"), "left_anti")
      case None => rows
    }
  }

  /** `distributed_json_path_types` rows: the json_writer's body walk
    * (exporter/metadataexporter/json_writer.go walkNode + flushTypeSet) over
    * every JSON-object body — per-batch set union of (path, type) pairs,
    * tagged (signal='logs', field_context='body') like the flush SQL. The
    * kernel is per-row codegen; the cross-record union is one distinct().
    */
  def jsonPathTypes(logsV2: DataFrame, maxDepth: Int = 100,
      maxArrayElements: Int = 100, maxKeysAtLevel: Int = 1024): DataFrame =
    logsV2
      .select(explode(graft.functions.JsonPathTypes(
        col("body"), maxDepth, maxArrayElements, maxKeysAtLevel)).as("__pt"))
      .select(col("__pt.path").as("path"), col("__pt.dtype").as("data_type"))
      .distinct()
      .select(lit("logs").as("signal"), lit("body").as("field_context"),
        col("path"), col("data_type"))
}
