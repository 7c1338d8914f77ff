package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Metadata conformance tests porting the reference's canonical V1/V2
  * example docs and invalid-doc cases (table/metadata_test.go:114-437). */
class MetadataSpec extends AnyFunSuite {

  val exampleV2: String = """{
    "format-version": 2,
    "table-uuid": "9c12d441-03fe-4693-9a96-a0705ddf69c1",
    "location": "s3://bucket/test/location",
    "last-sequence-number": 34,
    "last-updated-ms": 1602638573590,
    "last-column-id": 3,
    "current-schema-id": 1,
    "schemas": [
        {"type": "struct", "schema-id": 0, "fields": [{"id": 1, "name": "x", "required": true, "type": "long"}]},
        {
            "type": "struct",
            "schema-id": 1,
            "identifier-field-ids": [1, 2],
            "fields": [
                {"id": 1, "name": "x", "required": true, "type": "long"},
                {"id": 2, "name": "y", "required": true, "type": "long", "doc": "comment"},
                {"id": 3, "name": "z", "required": true, "type": "long"}
            ]
        }
    ],
    "default-spec-id": 0,
    "partition-specs": [{"spec-id": 0, "fields": [{"name": "x", "transform": "identity", "source-id": 1, "field-id": 1000}]}],
    "last-partition-id": 1000,
    "default-sort-order-id": 3,
    "sort-orders": [
        {
            "order-id": 3,
            "fields": [
                {"transform": "identity", "source-id": 2, "direction": "asc", "null-order": "nulls-first"},
                {"transform": "bucket[4]", "source-id": 3, "direction": "desc", "null-order": "nulls-last"}
            ]
        }
    ],
    "properties": {"read.split.target.size": "134217728"},
    "current-snapshot-id": 3055729675574597004,
    "snapshots": [
        {
            "snapshot-id": 3051729675574597004,
            "timestamp-ms": 1515100955770,
            "sequence-number": 0,
            "summary": {"operation": "append"},
            "manifest-list": "s3://a/b/1.avro"
        },
        {
            "snapshot-id": 3055729675574597004,
            "parent-snapshot-id": 3051729675574597004,
            "timestamp-ms": 1555100955770,
            "sequence-number": 1,
            "summary": {"operation": "append"},
            "manifest-list": "s3://a/b/2.avro",
            "schema-id": 1
        }
    ],
    "snapshot-log": [
        {"snapshot-id": 3051729675574597004, "timestamp-ms": 1515100955770},
        {"snapshot-id": 3055729675574597004, "timestamp-ms": 1555100955770}
    ],
    "metadata-log": [{"metadata-file": "s3://bucket/.../v1.json", "timestamp-ms": 1515100}],
    "refs": {"test": {"snapshot-id": 3051729675574597004, "type": "tag", "max-ref-age-ms": 10000000}}
  }"""

  val exampleV1: String = """{
    "format-version": 1,
    "table-uuid": "d20125c8-7284-442c-9aea-15fee620737c",
    "location": "s3://bucket/test/location",
    "last-updated-ms": 1602638573874,
    "last-column-id": 3,
    "schema": {
        "type": "struct",
        "fields": [
            {"id": 1, "name": "x", "required": true, "type": "long"},
            {"id": 2, "name": "y", "required": true, "type": "long", "doc": "comment"},
            {"id": 3, "name": "z", "required": true, "type": "long"}
        ]
    },
    "partition-spec": [{"name": "x", "transform": "identity", "source-id": 1, "field-id": 1000}],
    "properties": {},
    "current-snapshot-id": -1,
    "snapshots": [{"snapshot-id": 1925, "timestamp-ms": 1602638573822}]
  }"""

  test("parse V2 example: every accessor") {
    val md = TableMetadata.parse(exampleV2)
    assert(md.formatVersion == 2)
    assert(md.tableUuid == "9c12d441-03fe-4693-9a96-a0705ddf69c1")
    assert(md.location == "s3://bucket/test/location")
    assert(md.lastSequenceNumber == 34)
    assert(md.lastColumnId == 3)
    assert(md.schemas.size == 2)
    assert(md.currentSchema.schemaId == 1)
    assert(md.currentSchema.identifierFieldIds == Seq(1, 2))
    assert(md.currentSchema.fields.map(_.name) == Seq("x", "y", "z"))
    assert(md.currentSchema.fields(1).doc.contains("comment"))
    assert(md.partitionSpec.fields.head.transform == IdentityTransform)
    assert(md.partitionSpec.fields.head.fieldId == 1000)
    assert(md.sortOrder.orderId == 3)
    assert(md.sortOrder.fields.map(_.direction) == Seq(SortAsc, SortDesc))
    assert(md.sortOrder.fields(1).transform == BucketTransform(4))
    assert(md.properties("read.split.target.size") == "134217728")
    assert(md.currentSnapshot.map(_.snapshotId).contains(3055729675574597004L))
    assert(md.currentSnapshot.flatMap(_.schemaId).contains(1))
    assert(md.snapshots.head.summary.map(_.operation).contains(OpAppend))
    assert(md.snapshotLog.size == 2)
    assert(md.metadataLog.head.metadataFile == "s3://bucket/.../v1.json")
    // explicit tag ref + synthesized main branch
    assert(md.refs("test").refType == TagRef)
    assert(md.refs("test").maxRefAgeMs.contains(10000000L))
    assert(md.refs("main").snapshotId == 3055729675574597004L)
  }

  test("snapshot resolution: by id, by ref, by time") {
    val md = TableMetadata.parse(exampleV2)
    assert(md.snapshotById(3051729675574597004L).nonEmpty)
    assert(md.snapshotByName("test").map(_.snapshotId).contains(3051729675574597004L))
    assert(md.snapshotByName("main").map(_.snapshotId).contains(3055729675574597004L))
    assert(md.snapshotAsOfTime(1515100955771L).map(_.snapshotId).contains(3051729675574597004L))
    assert(md.snapshotAsOfTime(1600000000000L).map(_.snapshotId).contains(3055729675574597004L))
    assert(md.snapshotAsOfTime(1L).isEmpty)
  }

  test("parse V1 example: schema list + spec synthesized, -1 snapshot → none") {
    val md = TableMetadata.parse(exampleV1)
    assert(md.formatVersion == 1)
    assert(md.schemas.size == 1)
    assert(md.currentSchema.fields.map(_.id) == Seq(1, 2, 3))
    assert(md.partitionSpecs.size == 1)
    assert(md.partitionSpec.fields.head.name == "x")
    assert(md.sortOrders == Seq(SortOrder.unsorted))
    assert(md.currentSnapshotId.isEmpty)
    assert(md.currentSnapshot.isEmpty)
    assert(md.refs.isEmpty)
  }

  test("invalid docs rejected") {
    // bad format version
    intercept[IllegalArgumentException](TableMetadata.parse("""{"format-version": 3}"""))
    intercept[IllegalArgumentException](TableMetadata.parse("""{"other": 1}"""))
    // current-schema-id not found
    val badSchema = exampleV2.replace("\"current-schema-id\": 1", "\"current-schema-id\": 7")
    intercept[IllegalArgumentException](TableMetadata.parse(badSchema))
    // default-spec-id not found
    val badSpec = exampleV2.replace("\"default-spec-id\": 0", "\"default-spec-id\": 5")
    intercept[IllegalArgumentException](TableMetadata.parse(badSpec))
    // default-sort-order-id not found
    val badSort = exampleV2.replace("\"default-sort-order-id\": 3", "\"default-sort-order-id\": 4")
    intercept[IllegalArgumentException](TableMetadata.parse(badSort))
    // invalid ref type
    val badRef = exampleV2.replace("\"type\": \"tag\"", "\"type\": \"zz\"")
    intercept[IllegalArgumentException](TableMetadata.parse(badRef))
    // missing operation in summary
    val badOp = exampleV2.replace("{\"operation\": \"append\"},", "{},")
    intercept[IllegalArgumentException](TableMetadata.parse(badOp))
  }

  test("json round trip") {
    val md = TableMetadata.parse(exampleV2)
    val md2 = TableMetadata.parse(md.toJson)
    assert(md2.currentSchema == md.currentSchema)
    assert(md2.snapshots == md.snapshots)
    assert(md2.refs == md.refs)
    assert(md2.partitionSpecs == md.partitionSpecs)
    assert(md2.sortOrders == md.sortOrders)
    assert(md2.properties == md.properties)
  }
}
