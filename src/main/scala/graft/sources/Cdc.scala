package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Json
import graft.util.Json._

/** CDC wire-format decoders: DynamoDB Streams and MongoDB/DocumentDB
  * change streams. The reference consumes both through AWS/Mongo driver
  * SDKs (dynamodb-source/.../StreamRecordConverter.java,
  * mongodb/.../StreamWorker.java + client/BsonHelper.java); the records
  * themselves travel as PUBLIC wire JSON (the DynamoDB Streams
  * GetRecords / Lambda-event record shape with AttributeValue-typed
  * maps, and MongoDB change-event documents in canonical Extended
  * JSON), so everything after the network hop — the recursive type
  * unmarshal, metadata attributes, bulk-action mapping, per-second
  * tie-breaking version — is running, tested code here. The network
  * consumer itself is the same documented egress seam as the
  * Kafka/SQS/Kinesis sources ([[Queues]], [[KinesisAgg]]).
  *
  * Both decoders are one UDF projection (the AttributeValue /
  * Extended-JSON trees are recursively typed — no fixed `from_json`
  * schema exists) followed by one window for the reference's
  * records-seen-this-second version counter. At scale the window
  * partitions by event second — millions of tiny groups, no hot key.
  *
  * Deliberate deviations, all documented here:
  *  - map/set iteration order: the reference collects into HashMap /
  *    HashSet (nondeterministic order); we preserve wire order, making
  *    decode deterministic.
  *  - DynamoDB `N` values stay as their wire decimal literal (the
  *    reference round-trips through BigDecimal, which may re-render
  *    scientific notation).
  *  - binary key attributes render as base64 (the reference's
  *    `convertKeys` accidentally renders the SDK buffer's toString).
  *  - version tie-breaking: the reference counts records per second in
  *    single-shard arrival order; distributed decode reproduces it as
  *    row_number over (second) ordered by sequence number, identical
  *    whenever per-shard arrival is sequence-ordered (the SDK contract).
  */
object Cdc {

  // =========================================================== DynamoDB

  /** Table identity the reference gets from DescribeTable (TableInfo). */
  final case class DdbConf(
      tableName: String,
      partitionKey: String,
      sortKey: Option[String] = None,
      /** reference StreamConfig.getStreamViewForRemoves: NEW_IMAGE (default) | OLD_IMAGE */
      viewOnRemove: String = "NEW_IMAGE")

  private val TtlPrincipal = "dynamodb.amazonaws.com" // RecordConverter.TTL_USER_PRINCIPAL
  private val TtlType = "Service"

  /** StreamRecordConverter.processAttributeValue: AttributeValue tree →
    * plain JSON value. Exactly one type key per AttributeValue. */
  private def ddbValue(av: JVal): JVal = av match {
    case JObj(Vector((t, v))) => (t, v) match {
      case ("S", s: JStr) => s
      case ("N", JStr(n)) => JNum(n)
      case ("B", s: JStr) => s // already base64 on the wire
      case ("BOOL", b: JBool) => b
      case ("NULL", _) => JNull
      case ("SS", JArr(xs)) => JArr(xs)
      case ("NS", JArr(xs)) => JArr(xs.map { case JStr(n) => JNum(n); case o => o })
      case ("BS", JArr(xs)) => JArr(xs)
      case ("L", JArr(xs)) => JArr(xs.map(ddbValue))
      case ("M", JObj(fs)) => JObj(fs.map { case (k, x) => k -> ddbValue(x) })
      case _ => throw new JsonError(s"unsupported attribute type: $t")
    }
    case _ => throw new JsonError("attribute value must be a single-key object")
  }

  /** convertKeys: key attributes can only be S, N or B; all render as
    * strings (N keeps the wire literal, B stays base64 — see deviations). */
  private def ddbKeyString(av: JVal): String = av match {
    case JObj(Vector((_, JStr(s)))) => s
    case _ => throw new JsonError("key attribute must be S/N/B")
  }

  /** UDF result row (public so generated code can reach the accessors). */
  case class DdbRow(
      eventName: String, seqNo: String, tsSec: Long, tsMillis: Long,
      dataJson: String, partitionKey: String, sortKey: Option[String],
      ttlDelete: Boolean, err: Option[String])

  private def decodeDdbRecord(json: String, conf: DdbConf): DdbRow = {
    try {
      val rec = Json.parse(json).asInstanceOf[JObj]
      val eventName = rec.get("eventName") match {
        case Some(JStr(s)) => s
        case _ => throw new JsonError("eventName missing")
      }
      val ddb = rec.get("dynamodb") match {
        case Some(o: JObj) => o
        case _ => throw new JsonError("dynamodb body missing")
      }
      // wire: epoch seconds, possibly fractional → Instant semantics
      val tsSecRaw = ddb.get("ApproximateCreationDateTime") match {
        case Some(JNum(n)) => BigDecimal(n)
        case _ => throw new JsonError("ApproximateCreationDateTime missing")
      }
      val tsMillis = (tsSecRaw * 1000).toLong
      val seqNo = ddb.get("SequenceNumber") match {
        case Some(JStr(s)) => s
        case _ => ""
      }
      // getStreamRecordFromImage: REMOVE honors view_on_remove=OLD_IMAGE
      // when an old image exists; everything else (and the fallback) is
      // the new image; an absent image decodes to the empty document.
      val newImage = ddb.get("NewImage").collect { case o: JObj => o }
      val oldImage = ddb.get("OldImage").collect { case o: JObj => o }
      val image =
        if (eventName == "REMOVE" && conf.viewOnRemove == "OLD_IMAGE" && oldImage.nonEmpty) oldImage
        else newImage
      val data = image.getOrElse(JObj(Vector.empty))
      val dataJson = Json.write(JObj(data.fields.map { case (k, v) => k -> ddbValue(v) }))
      val keys = ddb.get("Keys") match {
        case Some(o: JObj) => o
        case _ => JObj(Vector.empty)
      }
      val pk = keys.get(conf.partitionKey).map(ddbKeyString).getOrElse(
        throw new JsonError(s"partition key ${conf.partitionKey} missing"))
      val sk = conf.sortKey.flatMap(n => keys.get(n).map(ddbKeyString))
      // TTL deletes: REMOVE by the DynamoDB TTL service principal
      val ttl = eventName == "REMOVE" && (rec.get("userIdentity") match {
        case Some(u: JObj) =>
          u.get("PrincipalId").contains(JStr(TtlPrincipal)) &&
            u.get("Type").contains(JStr(TtlType))
        case _ => false
      })
      DdbRow(eventName, seqNo, tsMillis / 1000, tsMillis, dataJson, pk, sk, ttl, None)
    } catch {
      case e: Exception =>
        DdbRow("", "", 0L, 0L, "", "", None, ttlDelete = false,
          Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  /** Decode a DataFrame of DynamoDB Streams record JSON (one record per
    * row) into the reference's event surface: `data` (plain JSON) plus
    * the StreamRecordConverter metadata attributes as columns. Malformed
    * records land with a non-null `err` (quarantine surface), never an
    * exception. Other input columns pass through. */
  def ddbStream(df: DataFrame, jsonCol: String, conf: DdbConf): DataFrame = {
    val dec = udf((s: String) => decodeDdbRecord(s, conf))
    var d = "_ddb"
    while (df.columns.contains(d)) d += "_"
    // collision-proof temp (a fixed "_ts_sec" would silently drop a
    // caller column of the same name at the final drop)
    val tsSec = d + "_sec"
    val keep = df.columns.filterNot(_ == jsonCol).map(col)
    val base = df.withColumn(d, dec(col(jsonCol)))
      .select(keep ++ Seq(
        lit(conf.tableName).as("table_name"),
        col(s"$d.eventName").as("dynamodb_event_name"),
        when(col(s"$d.eventName") === "REMOVE", "delete")
          .otherwise("index").as("opensearch_action"),
        col(s"$d.tsMillis").as("dynamodb_timestamp"),
        col(s"$d.tsSec").as(tsSec),
        col(s"$d.seqNo").as("sequence_number"),
        col(s"$d.partitionKey").as("partition_key"),
        col(s"$d.sortKey").as("sort_key"),
        concat_ws("|",
          Seq(col(s"$d.partitionKey")) ++
            Seq(col(s"$d.sortKey")): _*).as("primary_key"),
        col(s"$d.ttlDelete").as("ttl_delete"),
        col(s"$d.dataJson").as("data"),
        col(s"$d.err").as("err")): _*)
    withVersion(base, col(tsSec),
      Seq(length(col("sequence_number")), col("sequence_number")))
      .drop(tsSec)
  }

  /** calculateTieBreakingVersionFromTimestamp as a window:
    * second * 1e6 + zero-based rank within that second. */
  private def withVersion(df: DataFrame, second: Column, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(second).orderBy(order: _*)
    df.withColumn("document_version",
      second * lit(1000000L) + row_number().over(w) - 1)
  }

  // ============================================== MongoDB change stream

  /** StreamWorker.CRUD_OPERATION_TYPE: the change events that produce
    * documents (everything else is control traffic the worker skips or
    * terminates on). */
  private val MongoCrud = Set("insert", "update", "replace", "delete")

  /** BsonHelper.JSON_WRITER_SETTINGS: canonical Extended JSON value →
    * the reference's relaxed form with custom converters. Unrecognized
    * `$`-keyed wrappers that relaxed mode would emit verbatim ($symbol,
    * $code, …) pass through untouched. */
  private def relax(v: JVal): JVal = v match {
    case o @ JObj(fields) =>
      o.fields match {
        case Vector(("$oid", JStr(h))) => JStr(h)
        case Vector(("$date", JObj(Vector(("$numberLong", JStr(m)))))) => JNum(m)
        case Vector(("$numberInt", JStr(n))) => JNum(n)
        case Vector(("$numberLong", JStr(n))) => JNum(n)
        case Vector(("$numberDouble", JStr(n))) =>
          // canonical spells non-finite as strings; BigDecimal plain-form
          // rendering matches Jackson's double output for finite values
          if (n == "Infinity" || n == "-Infinity" || n == "NaN") JStr(n)
          else JNum(BigDecimal(n).bigDecimal.toPlainString)
        case Vector(("$numberDecimal", JStr(n))) =>
          JStr(BigDecimal(n).bigDecimal.toPlainString)
        case Vector(("$binary", JObj(bin))) =>
          val b64 = JObj(bin).get("base64").collect { case JStr(s) => s }.getOrElse("")
          val sub = JObj(bin).get("subType").collect { case JStr(s) => s }.getOrElse("00")
          if (sub.equalsIgnoreCase("04")) JStr(uuidFromBase64(b64)) else JStr(b64)
        case Vector(("$timestamp", JObj(ts))) =>
          JObj(ts).get("t") match {
            case Some(n: JNum) => n
            case _ => JNull
          }
        case Vector(("$regularExpression", JObj(re))) =>
          JObj(Vector(
            "pattern" -> JObj(re).get("pattern").getOrElse(JStr("")),
            "options" -> JObj(re).get("options").getOrElse(JStr(""))))
        case Vector(("$maxKey", _)) | Vector(("$minKey", _)) |
             Vector(("$undefined", _)) => JNull
        case _ => JObj(fields.map { case (k, x) => k -> relax(x) })
      }
    case JArr(items) => JArr(items.map(relax))
    case other => other
  }

  private def uuidFromBase64(b64: String): String = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }

  /** BsonHelper-style type name for the `_id` attribute (metadata
    * documentdb_id_bson_type), from the canonical Extended JSON marker. */
  private def bsonTypeName(v: JVal): String = v match {
    case JObj(Vector(("$oid", _))) => "ObjectId"
    case JObj(Vector(("$numberInt", _))) => "Int32"
    case JObj(Vector(("$numberLong", _))) => "Int64"
    case JObj(Vector(("$numberDouble", _))) => "Double"
    case JObj(Vector(("$numberDecimal", _))) => "Decimal128"
    case JObj(Vector(("$date", _))) => "Date"
    case JObj(Vector(("$timestamp", _))) => "Timestamp"
    case JObj(Vector(("$binary", _))) => "Binary"
    case _: JObj => "Document"
    case _: JStr => "String"
    case _: JNum => "Number"
    case _: JBool => "Boolean"
    case JNull => "Null"
    case _: JArr => "Array"
  }

  /** getAttributeValue / String.valueOf on the relaxed `_id`. */
  private def idString(v: JVal): String = v match {
    case JStr(s) => s
    case JNum(raw) => raw
    case JBool(b) => b.toString
    case JNull => "null"
    case other => Json.write(other)
  }

  /** UDF result row (public so generated code can reach the accessors). */
  case class MongoRow(
      eventName: String, collection: String, tsSec: Long, orderI: Long,
      dataJson: String, partitionKey: String, idBsonType: String,
      crud: Boolean, err: Option[String])

  private def decodeMongoEvent(json: String): MongoRow = {
    try {
      val ev = Json.parse(json).asInstanceOf[JObj]
      val op = ev.get("operationType") match {
        case Some(JStr(s)) => s
        case _ => throw new JsonError("operationType missing")
      }
      val ns = ev.get("ns").collect { case o: JObj => o }.getOrElse(JObj(Vector.empty))
      val coll = (ns.get("db"), ns.get("coll")) match {
        case (Some(JStr(db)), Some(JStr(c))) => s"$db.$c"
        case _ => ""
      }
      val (tsSec, orderI) = ev.get("clusterTime") match {
        case Some(JObj(Vector(("$timestamp", ts: JObj)))) =>
          (ts.get("t"), ts.get("i")) match {
            case (Some(JNum(t)), Some(JNum(i))) => (t.toLong, i.toLong)
            case _ => throw new JsonError("clusterTime malformed")
          }
        case _ => throw new JsonError("clusterTime missing")
      }
      if (!MongoCrud(op))
        return MongoRow(op, coll, tsSec, orderI, "", "", "", crud = false, None)
      // StreamWorker: DELETE carries only the document key; CRUD
      // otherwise requires the (updateLookup) full document.
      val record = (if (op == "delete") ev.get("documentKey") else ev.get("fullDocument")) match {
        case Some(o: JObj) => o
        case _ => throw new JsonError(s"$op event without document")
      }
      val relaxed = JObj(record.fields.map { case (k, v) => k -> relax(v) })
      val idRaw = record.get("_id").getOrElse(JNull)
      val pk = idString(relax(idRaw))
      MongoRow(op, coll, tsSec, orderI, Json.write(relaxed), pk,
        bsonTypeName(idRaw), crud = true, None)
    } catch {
      case e: Exception =>
        MongoRow("", "", 0L, 0L, "", "", "", crud = false,
          Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  /** Decode a DataFrame of MongoDB change-stream events (canonical
    * Extended JSON, one event per row) into the reference's event
    * surface (mongodb/.../RecordConverter.convert): `data` in
    * BsonHelper's relaxed-with-converters JSON plus the metadata
    * attribute columns. Non-CRUD control events are dropped (the
    * reference worker skips them); malformed events carry `err`.
    * `collection` overrides the ns-derived name the way the reference
    * takes it from config. */
  def mongoChange(df: DataFrame, jsonCol: String,
      collection: Option[String] = None): DataFrame = {
    val dec = udf(decodeMongoEvent _)
    var d = "_mc"
    while (df.columns.contains(d)) d += "_"
    // collision-proof temps (see ddbStream)
    val tsSec = d + "_sec"
    val orderI = d + "_i"
    val keep = df.columns.filterNot(_ == jsonCol).map(col)
    val base = df.withColumn(d, dec(col(jsonCol)))
      .where(col(s"$d.crud") || col(s"$d.err").isNotNull)
      .select(keep ++ Seq(
        collection.map(lit).getOrElse(col(s"$d.collection"))
          .as("documentdb_collection"),
        col(s"$d.eventName").as("documentdb_event_name"),
        when(col(s"$d.eventName") === "delete", "delete")
          .otherwise("index").as("opensearch_action"),
        (col(s"$d.tsSec") * 1000L).as("documentdb_timestamp"),
        col(s"$d.tsSec").as(tsSec),
        col(s"$d.orderI").as(orderI),
        col(s"$d.partitionKey").as("partition_key"),
        col(s"$d.partitionKey").as("primary_key"),
        col(s"$d.idBsonType").as("documentdb_id_bson_type"),
        col(s"$d.dataJson").as("data"),
        col(s"$d.err").as("err")): _*)
    withVersion(base, col(tsSec), Seq(col(orderI)))
      .drop(tsSec, orderI)
  }
}
