package graft.cli

import graft.catalog.{Catalog, RestCatalog}
import graft.core._
import graft.spark.IcebergTables

/** CLI surface (parity with `cmd/icegopher/main.go:34-333`): catalog/table
  * inspection verbs with text or json output. Tables resolve either through
  * a REST catalog (`--uri http...` + `ns.table` identifiers) or directly
  * from a local table directory path.
  *
  * Usage:
  *   graft list --uri URI [NS]             list namespaces / tables
  *   graft location TABLE                  table location
  *   graft describe TABLE                  full metadata description
  *   graft schema TABLE                    current schema
  *   graft spec TABLE                      partition spec
  *   graft uuid TABLE                      table uuid
  *   graft files TABLE [--history]         snapshot→manifest→file tree
  *   graft snapshots TABLE                 snapshot log
  *   graft refs TABLE                      branches and tags
  *   graft properties get TABLE [KEY]      table properties
  */
object Main {

  private case class Config(uri: String = "", json: Boolean = false,
                            credential: String = "")

  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    var cfg = Config()
    flags.foreach {
      case f if f.startsWith("--uri=") => cfg = cfg.copy(uri = f.stripPrefix("--uri="))
      case f if f.startsWith("--credential=") =>
        cfg = cfg.copy(credential = f.stripPrefix("--credential="))
      case "--json" => cfg = cfg.copy(json = true)
      case "--history" => // consumed by files verb below
      case other => die(s"unknown flag: $other")
    }
    val history = flags.contains("--history")

    pos.toList match {
      case "list" :: rest => listCmd(cfg, rest)
      case "location" :: id :: Nil => println(loadMeta(cfg, id).location)
      case "uuid" :: id :: Nil => println(loadMeta(cfg, id).tableUuid)
      case "schema" :: id :: Nil => println(loadMeta(cfg, id).currentSchema.repr)
      case "spec" :: id :: Nil => printSpec(loadMeta(cfg, id))
      case "describe" :: id :: Nil => describe(loadMeta(cfg, id))
      case "files" :: id :: Nil => files(cfg, id, history)
      case "snapshots" :: id :: Nil => snapshots(loadMeta(cfg, id))
      case "refs" :: id :: Nil => refs(loadMeta(cfg, id))
      case "properties" :: "get" :: id :: rest => properties(loadMeta(cfg, id), rest)
      case _ => die(usage)
    }
  }

  private val usage =
    "usage: graft [--uri=URI] [--credential=ID:SECRET] [--json] " +
      "<list|location|uuid|schema|spec|describe|files|snapshots|refs|properties> ..."

  private def die(msg: String): Nothing = { System.err.println(msg); sys.exit(2) }

  private def catalog(cfg: Config): Catalog = {
    if (cfg.uri.isEmpty) die("--uri is required for catalog commands")
    val props = if (cfg.credential.nonEmpty)
      Map(RestCatalog.KeyCredential -> cfg.credential) else Map.empty[String, String]
    Catalog.load("cli", cfg.uri, props)
  }

  /** Table identifiers: a filesystem path → local table; `ns.table` → REST. */
  private def loadMeta(cfg: Config, id: String): TableMetadata =
    if (id.contains("/") || id.startsWith("file:"))
      IcebergTables.load(id).metadata
    else catalog(cfg).loadTable(id.split('.').toSeq).metadata

  private def listCmd(cfg: Config, rest: List[String]): Unit = {
    val cat = catalog(cfg)
    rest match {
      case Nil => cat.listNamespaces().foreach(ns => println(ns.mkString(".")))
      case ns :: Nil =>
        cat.listTables(ns.split('.').toSeq).foreach(t => println(t.mkString(".")))
      case _ => die(usage)
    }
  }

  private def printSpec(md: TableMetadata): Unit = {
    val spec = md.partitionSpec
    if (spec.isUnpartitioned) println("[unpartitioned]")
    else spec.fields.foreach(f =>
      println(s"${f.fieldId}: ${f.name}: ${f.transform.repr}(${f.sourceId})"))
  }

  private def describe(md: TableMetadata): Unit = {
    println(s"Table format version: ${md.formatVersion}")
    println(s"Metadata location:    ${md.location}")
    println(s"Table UUID:           ${md.tableUuid}")
    println(s"Last updated:         ${md.lastUpdatedMs}")
    println(s"Sort order:           ${md.sortOrder.orderId}")
    println(s"Partition spec:       ${md.partitionSpec.fields.map(_.name).mkString(", ")}")
    println("Current schema:")
    println(md.currentSchema.repr)
    md.currentSnapshot.foreach { s =>
      println(s"Current snapshot:     ${s.snapshotId} (seq ${s.sequenceNumber})")
    }
  }

  private def files(cfg: Config, id: String, history: Boolean): Unit = {
    val table = if (id.contains("/")) IcebergTables.load(id)
      else die("files verb requires a local table path in this build")
    val md = table.metadata
    val snaps = if (history) md.snapshots
      else md.currentSnapshot.toSeq
    snaps.foreach { s =>
      println(s"Snapshot ${s.snapshotId}, schema ${s.schemaId.getOrElse(0)}: " +
        s"${s.manifestList}")
      ManifestIO.readManifestList(table.io.open(s.manifestList)).foreach { m =>
        println(s"  ├── Manifest: ${m.path} (content=${m.content})")
        ManifestIO.readManifestEntries(table.io.open(m.path), m).foreach { e =>
          println(s"  │    ├── Datafile: ${e.dataFile.path} " +
            s"(${e.dataFile.recordCount} rows)")
        }
      }
    }
  }

  private def snapshots(md: TableMetadata): Unit =
    md.snapshots.foreach { s =>
      val op = s.summary.map(_.operation.repr).getOrElse("")
      println(s"${s.snapshotId}\t${s.timestampMs}\tseq=${s.sequenceNumber}\t$op")
    }

  private def refs(md: TableMetadata): Unit =
    md.refs.toSeq.sortBy(_._1).foreach { case (name, r) =>
      println(s"$name\t${r.refType.repr}\t${r.snapshotId}")
    }

  private def properties(md: TableMetadata, rest: List[String]): Unit = rest match {
    case Nil => md.properties.toSeq.sortBy(_._1)
      .foreach { case (k, v) => println(s"$k\t$v") }
    case key :: Nil => md.properties.get(key) match {
      case Some(v) => println(v)
      case None => die(s"property $key not found")
    }
    case _ => die(usage)
  }
}
