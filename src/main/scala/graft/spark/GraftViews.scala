package graft.spark

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.connector.catalog.{Identifier, View}
import org.apache.spark.sql.types.{DataType, StructType}

/** Persistent SQL view metadata for [[GraftCatalog]] — the capability the
  * Iceberg ecosystem layers next to tables (Iceberg view spec: versioned
  * metadata JSON with SQL representations; the reference's REST catalog
  * stops at tables). Shape follows the Iceberg view spec — `view-uuid`,
  * `current-version-id`, a `versions` list whose entries carry a
  * `representations` array of `{type: "sql", sql, dialect}` — with the
  * Spark-plane extras (`spark-schema`, query column names/aliases/comments)
  * as extension fields so a round-trip through
  * [[org.apache.spark.sql.connector.catalog.ViewCatalog]] is exact.
  *
  * Every CREATE OR REPLACE appends a new version and moves
  * `current-version-id` — version history is retained, mirroring table
  * snapshot history.
  */
final case class ViewVersion(
    versionId: Int,
    timestampMs: Long,
    sql: String,
    dialect: String,
    defaultCatalog: String,
    defaultNamespace: Seq[String],
    sparkSchemaJson: String,
    queryColumnNames: Seq[String],
    columnAliases: Seq[String],
    columnComments: Seq[Option[String]])

final case class ViewMetadata(
    viewUuid: String,
    location: String,
    currentVersionId: Int,
    versions: Seq[ViewVersion],
    properties: Map[String, String]) {

  def current: ViewVersion = versions.find(_.versionId == currentVersionId)
    .getOrElse(throw new IllegalStateException(
      s"view $location: current-version-id $currentVersionId not in versions"))

  def toJson: String = {
    val mapper = new ObjectMapper()
    val out = new java.io.StringWriter()
    val gen = mapper.createGenerator(out)
    gen.writeStartObject()
    gen.writeNumberField("format-version", 1)
    gen.writeStringField("view-uuid", viewUuid)
    gen.writeStringField("location", location)
    gen.writeNumberField("current-version-id", currentVersionId)
    gen.writeArrayFieldStart("versions")
    versions.foreach { v =>
      gen.writeStartObject()
      gen.writeNumberField("version-id", v.versionId)
      gen.writeNumberField("timestamp-ms", v.timestampMs)
      gen.writeArrayFieldStart("representations")
      gen.writeStartObject()
      gen.writeStringField("type", "sql")
      gen.writeStringField("sql", v.sql)
      gen.writeStringField("dialect", v.dialect)
      gen.writeEndObject()
      gen.writeEndArray()
      gen.writeStringField("default-catalog", v.defaultCatalog)
      gen.writeArrayFieldStart("default-namespace")
      v.defaultNamespace.foreach(gen.writeString)
      gen.writeEndArray()
      gen.writeStringField("spark-schema", v.sparkSchemaJson)
      gen.writeArrayFieldStart("query-column-names")
      v.queryColumnNames.foreach(gen.writeString)
      gen.writeEndArray()
      gen.writeArrayFieldStart("column-aliases")
      v.columnAliases.foreach(gen.writeString)
      gen.writeEndArray()
      gen.writeArrayFieldStart("column-comments")
      v.columnComments.foreach {
        case Some(c) => gen.writeString(c)
        case None => gen.writeNull()
      }
      gen.writeEndArray()
      gen.writeEndObject()
    }
    gen.writeEndArray()
    gen.writeObjectFieldStart("properties")
    properties.foreach { case (k, v) => gen.writeStringField(k, v) }
    gen.writeEndObject()
    gen.writeEndObject()
    gen.close()
    out.toString
  }
}

object ViewMetadata {
  private val mapper = new ObjectMapper()

  /** Parse ONE `versions` entry (shared with the REST plane, whose
    * CreateViewRequest/UpdateViewRequest carry single view-version nodes
    * of exactly this shape). */
  def parseVersion(v: JsonNode): ViewVersion = {
    def strs(n: JsonNode): Seq[String] =
      n.elements().asScala.map(_.asText()).toSeq
    val rep = v.get("representations").elements().asScala
      .find(r => r.get("type").asText() == "sql")
      .getOrElse(throw new IllegalArgumentException(
        "view version has no sql representation"))
    ViewVersion(
      versionId = v.get("version-id").asInt(),
      timestampMs = v.get("timestamp-ms").asLong(),
      sql = rep.get("sql").asText(),
      dialect = rep.get("dialect").asText(),
      defaultCatalog = v.get("default-catalog").asText(),
      defaultNamespace = strs(v.get("default-namespace")),
      sparkSchemaJson = v.get("spark-schema").asText(),
      queryColumnNames = strs(v.get("query-column-names")),
      columnAliases = strs(v.get("column-aliases")),
      columnComments = v.get("column-comments").elements().asScala
        .map(n => if (n.isNull) None else Some(n.asText())).toSeq)
  }

  /** Serialize ONE view version to its `versions`-entry JSON node — the
    * payload of the REST plane's add-view-version update action. */
  def versionJson(v: ViewVersion): String = {
    val n = mapper.createObjectNode()
    n.put("version-id", v.versionId)
    n.put("timestamp-ms", v.timestampMs)
    val reps = n.putArray("representations")
    val rep = reps.addObject()
    rep.put("type", "sql"); rep.put("sql", v.sql); rep.put("dialect", v.dialect)
    n.put("default-catalog", v.defaultCatalog)
    val dns = n.putArray("default-namespace"); v.defaultNamespace.foreach(dns.add)
    n.put("spark-schema", v.sparkSchemaJson)
    val qcn = n.putArray("query-column-names"); v.queryColumnNames.foreach(qcn.add)
    val ca = n.putArray("column-aliases"); v.columnAliases.foreach(ca.add)
    val cc = n.putArray("column-comments")
    v.columnComments.foreach {
      case Some(c) => cc.add(c)
      case None => cc.addNull()
    }
    mapper.writeValueAsString(n)
  }

  def parse(json: String): ViewMetadata = {
    val root = mapper.readTree(json)
    val versions = root.get("versions").elements().asScala
      .map(parseVersion).toSeq
    ViewMetadata(
      viewUuid = root.get("view-uuid").asText(),
      location = root.get("location").asText(),
      currentVersionId = root.get("current-version-id").asInt(),
      versions = versions,
      properties = Option(root.get("properties")).map(p =>
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty))
  }
}

/** Spark [[View]] over the current version of a [[ViewMetadata]]. */
final class GraftView(ident: Identifier, md: ViewMetadata) extends View {
  private val v = md.current
  override def name(): String = ident.toString
  override def query(): String = v.sql
  override def currentCatalog(): String = v.defaultCatalog
  override def currentNamespace(): Array[String] = v.defaultNamespace.toArray
  override def schema(): StructType =
    DataType.fromJson(v.sparkSchemaJson).asInstanceOf[StructType]
  override def queryColumnNames(): Array[String] = v.queryColumnNames.toArray
  override def columnAliases(): Array[String] = v.columnAliases.toArray
  override def columnComments(): Array[String] =
    v.columnComments.map(_.orNull).toArray
  override def properties(): util.Map[String, String] = md.properties.asJava
}
