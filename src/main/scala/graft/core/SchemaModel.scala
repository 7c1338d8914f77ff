package graft.core

/** Iceberg schema: a struct type + schema-id + identifier-field-ids, with the
  * lazy name/ID indexes and pruning/projection algorithms of the reference's
  * `schema.go` (indexes 59-152, `Select`/`PruneColumns` 291-314/638-793,
  * `HighestFieldID` 273-276), implemented as folds over the type ADT.
  */
final case class Schema(
    schemaId: Int,
    struct: StructT,
    identifierFieldIds: Seq[Int] = Nil) {

  def fields: Seq[NestedField] = struct.fields

  /** name→id over full paths: `a`, `a.b`, `a.element.b` plus the short-form
    * map/list names (`a.b` for map values and list elements) — mirrors
    * `indexByName` (schema.go:549-636). */
  lazy val nameToId: Map[String, Int] = SchemaIndex.byName(struct)
  lazy val lowerNameToId: Map[String, Int] =
    nameToId.map { case (k, v) => (k.toLowerCase, v) }
  lazy val idToField: Map[Int, NestedField] = SchemaIndex.byId(struct)
  /** id → full dotted path (the inverse of nameToId, preferring full paths). */
  lazy val idToName: Map[Int, String] =
    nameToId.toSeq.groupBy(_._2).map { case (id, ns) =>
      id -> ns.map(_._1).maxBy(_.length)
    }

  def findFieldByName(name: String): Option[NestedField] =
    nameToId.get(name).flatMap(idToField.get)
  def findFieldByNameCaseInsensitive(name: String): Option[NestedField] =
    lowerNameToId.get(name.toLowerCase).flatMap(idToField.get)
  def findFieldById(id: Int): Option[NestedField] = idToField.get(id)
  def findColumnName(id: Int): Option[String] = idToName.get(id)

  def highestFieldId: Int = SchemaIndex.maxId(struct)

  /** Project the schema to the named columns (and their nested parents),
    * `Select` semantics (schema.go:291-314): unknown names error; selected
    * struct fields keep their full subtree. */
  def select(caseSensitive: Boolean, names: String*): Schema = {
    val index = if (caseSensitive) nameToId else lowerNameToId
    val ids = names.map { n =>
      val key = if (caseSensitive) n else n.toLowerCase
      index.getOrElse(key,
        throw new IllegalArgumentException(s"could not find column '$n' in schema"))
    }.toSet
    // expand: a selected field keeps its whole subtree
    val full = ids.flatMap(id => idToField.get(id).map(f => SchemaIndex.subtreeIds(f)).getOrElse(Set(id)))
    prune(full)
  }

  /** Keep only fields whose id is in `ids` (plus ancestor shells) —
    * `PruneColumns` (schema.go:638-793). Selecting *through* a list/map
    * requires the element/value id itself to be present, matching the
    * reference's refusal to project partial list/map element structs. */
  def prune(ids: Set[Int]): Schema = {
    def pruneStruct(s: StructT): StructT =
      StructT(s.fields.flatMap { f =>
        if (ids.contains(f.id)) Some(f)
        else pruneType(f.fieldType).map(t => f.copy(fieldType = t))
      })
    def pruneType(t: IcebergType): Option[IcebergType] = t match {
      case s: StructT =>
        val pruned = pruneStruct(s)
        if (pruned.fields.nonEmpty) Some(pruned) else None
      case l: ListT =>
        if (ids.contains(l.elementId)) l.element match {
          // selected struct element keeps only its selected children
          case es: StructT => Some(l.copy(element = pruneType(es).getOrElse(StructT(Nil))))
          case _ => Some(l)
        } else pruneType(l.element).map(e => l.copy(element = e))
      case m: MapT =>
        if (ids.contains(m.valueId)) m.value match {
          case vs: StructT => Some(m.copy(value = pruneType(vs).getOrElse(StructT(Nil))))
          case _ => Some(m)
        } else pruneType(m.value) match {
          case Some(v) => Some(m.copy(value = v))
          // selecting a map's key keeps the whole map (schema.go:765-771)
          case None if ids.contains(m.keyId) => Some(m)
          case None => None
        }
      case _ => None
    }
    Schema(schemaId, pruneStruct(struct), identifierFieldIds.filter(ids.contains))
  }

  def repr: String = struct.repr
}

/** Index builders: each is a single fold over the type tree (the Scala
  * equivalent of the reference's `SchemaVisitor` machinery, schema.go:337-391). */
object SchemaIndex {

  /** Walk (path, field) pairs depth-first. List elements contribute
    * `path.element`; map keys/values `path.key` / `path.value`; plus the
    * short names (`path.<child>` skipping element/value) the reference also
    * indexes. */
  def byName(struct: StructT): Map[String, Int] = {
    val acc = Map.newBuilder[String, Int]
    def visitField(prefix: String, f: NestedField): Unit = {
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      acc += path -> f.id
      visitType(path, f.fieldType)
    }
    def visitType(path: String, t: IcebergType): Unit = t match {
      case s: StructT => s.fields.foreach(visitField(path, _))
      case l: ListT =>
        acc += s"$path.element" -> l.elementId
        visitType(s"$path.element", l.element)
        // short form: list-of-struct children reachable without `.element`
        l.element match {
          case s: StructT => s.fields.foreach { f =>
            acc += s"$path.${f.name}" -> f.id
            visitType(s"$path.${f.name}", f.fieldType)
          }
          case _ =>
        }
      case m: MapT =>
        acc += s"$path.key" -> m.keyId
        acc += s"$path.value" -> m.valueId
        visitType(s"$path.key", m.key)
        visitType(s"$path.value", m.value)
        m.value match {
          case s: StructT => s.fields.foreach { f =>
            acc += s"$path.${f.name}" -> f.id
            visitType(s"$path.${f.name}", f.fieldType)
          }
          case _ =>
        }
      case _ =>
    }
    struct.fields.foreach(visitField("", _))
    acc.result()
  }

  def byId(struct: StructT): Map[Int, NestedField] = {
    val acc = Map.newBuilder[Int, NestedField]
    def visit(f: NestedField): Unit = {
      acc += f.id -> f
      visitType(f.fieldType)
    }
    def visitType(t: IcebergType): Unit = t match {
      case s: StructT => s.fields.foreach(visit)
      case l: ListT => visit(l.elementField)
      case m: MapT => visit(m.keyField); visit(m.valueField)
      case _ =>
    }
    struct.fields.foreach(visit)
    acc.result()
  }

  /** Highest field id anywhere in the tree (`findLastFieldID`, schema.go:830-850). */
  def maxId(struct: StructT): Int = {
    var m = 0
    def visit(f: NestedField): Unit = {
      if (f.id > m) m = f.id
      visitType(f.fieldType)
    }
    def visitType(t: IcebergType): Unit = t match {
      case s: StructT => s.fields.foreach(visit)
      case l: ListT => visit(l.elementField)
      case mp: MapT => visit(mp.keyField); visit(mp.valueField)
      case _ =>
    }
    struct.fields.foreach(visit)
    m
  }

  /** All field ids in a field's subtree, including its own. */
  def subtreeIds(f: NestedField): Set[Int] = {
    val acc = Set.newBuilder[Int]
    def visit(f: NestedField): Unit = { acc += f.id; visitType(f.fieldType) }
    def visitType(t: IcebergType): Unit = t match {
      case s: StructT => s.fields.foreach(visit)
      case l: ListT => visit(l.elementField)
      case m: MapT => visit(m.keyField); visit(m.valueField)
      case _ =>
    }
    visit(f)
    acc.result()
  }
}

object Schema {
  import com.fasterxml.jackson.databind.JsonNode

  /** Parse a schema object from Iceberg metadata JSON. */
  def fromJson(node: JsonNode): Schema = {
    val t = IcebergTypeJson.parse(node)
    val struct = t match {
      case s: StructT => s
      case other => throw new IllegalArgumentException(s"schema must be a struct, got: $other")
    }
    val id = Option(node.get("schema-id")).map(_.asInt()).getOrElse(0)
    val idents = Option(node.get("identifier-field-ids")).map { arr =>
      val b = Vector.newBuilder[Int]; arr.forEach(n => b += n.asInt()); b.result()
    }.getOrElse(Vector.empty)
    Schema(id, struct, idents)
  }
}
