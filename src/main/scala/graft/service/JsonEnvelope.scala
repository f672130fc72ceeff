package graft.service

import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** The reference's public REST envelope — the nested request/response JSON of
  * `/root/reference/src/common/json_request.cpp` and `swagger.yaml:26-41,
  * 412-420,535-557`. A client of the reference service can point the same
  * request bodies at [[ProtectionService]] and get the same response shapes
  * and the same validation errors back.
  *
  * Parse semantics mirror `SafeGetFromJsonPath` (`json_request.cpp:37-57`):
  * any scalar found at a nested path stringifies; a missing path, a container
  * where a scalar is expected, or malformed JSON leaves the field in its
  * "missing" state, and validation reports the reference's exact
  * `Missing required fields: …` message.
  */
object JsonEnvelope {

  private[graft] val mapper = new ObjectMapper()

  /** Enum string tables (`enum_utils.cpp:52-120`) — membership is the parse
    * check; an unknown string behaves exactly like an absent field.
    */
  final val Datatypes = Set("BOOLEAN", "INT32", "INT64", "INT96", "FLOAT",
    "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")
  final val Compressions = Set("UNCOMPRESSED", "SNAPPY", "GZIP", "BROTLI",
    "ZSTD", "LZ4", "LZ4_FRAME", "LZO", "BZ2", "LZ4_HADOOP")
  final val Encodings = Set("PLAIN", "PLAIN_DICTIONARY", "RLE", "BIT_PACKED",
    "DELTA_BINARY_PACKED", "DELTA_LENGTH_BYTE_ARRAY", "DELTA_BYTE_ARRAY",
    "RLE_DICTIONARY", "BYTE_STREAM_SPLIT", "UNDEFINED", "UNKNOWN")

  /** `SafeGetFromJsonPath`: traverse, then stringify any scalar; containers
    * and nulls yield None (the reference's string conversion throws there).
    */
  private[service] def safeGet(root: JsonNode, path: String*): Option[String] = {
    var cur = root
    if (cur == null) return None
    for (field <- path) {
      if (cur == null || !cur.has(field)) return None
      cur = cur.get(field)
    }
    if (cur == null || cur.isNull || cur.isContainerNode) None
    else Some(cur.asText())
  }

  /** `SafeParseToInt` (`json_request.cpp:60-66`) — C++ `std::stoi`: skips
    * leading whitespace, accepts a sign, parses the longest digit prefix and
    * IGNORES trailing junk ("12abc" → 12); no digits at all fails.
    */
  private[service] def stoiLike(s: String): Option[Int] = {
    val m = java.util.regex.Pattern.compile("^\\s*[+-]?\\d+").matcher(s)
    if (!m.find()) None
    else try Some(m.group().trim.toInt)
    catch { case _: NumberFormatException => None } // out_of_range
  }

  private[service] def decodeBase64(s: String): Array[Byte] =
    try Base64.getDecoder.decode(s)
    catch { case _: IllegalArgumentException => Array.emptyByteArray }

  private[service] def b64(bytes: Array[Byte]): String =
    Base64.getEncoder.encodeToString(bytes)

  private def stringMap(node: JsonNode): Map[String, String] =
    if (node == null || !node.isObject) Map.empty
    else node.fields().asScala
      .filterNot(e => e.getValue.isContainerNode || e.getValue.isNull)
      .map(e => e.getKey -> e.getValue.asText()).toMap

  private[service] def putStringMap(parent: ObjectNode, field: String,
      values: Map[String, String]): Unit = {
    val node = parent.putObject(field)
    values.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
  }

  /** `BuildValidationError` (`json_request.cpp:93-104`). */
  private[service] def missingFieldsError(fields: Seq[String]): String =
    if (fields.isEmpty) "" else "Missing required fields: " + fields.mkString(", ")

  // --------------------------------------------------------------- requests --

  /** One parsed `/encrypt` or `/decrypt` request (`JsonRequest::ParseCommon`
    * + the per-operation value field, `json_request.cpp:265-329,383-397,
    * 483-506`). `encrypt` selects which value path and validation family
    * applies.
    */
  final case class ProtectRequest(
      encrypt: Boolean,
      columnName: String,
      datatype: Option[String],
      datatypeLength: Option[Int],
      datatypeLengthStr: String, // unparseable raw value, for the error message
      compression: Option[String],
      encoding: Option[String],
      encodingAttributes: Map[String, String],
      encryptedCompression: Option[String],
      keyId: String,
      userId: String,
      applicationContext: String,
      referenceId: String,
      value: Array[Byte],
      encryptionMetadata: Map[String, String]) {

    /** `JsonRequest::IsValid` + the per-operation value check
      * (`json_request.cpp:331-348,400-402,508-510`).
      */
    def isValid: Boolean =
      commonMissing.isEmpty && datatypeLengthStr.isEmpty && value.nonEmpty

    private def commonMissing: Seq[String] = Seq(
      (columnName.isEmpty, "column_reference.name"),
      (datatype.isEmpty, "data_batch.datatype_info.datatype"),
      (compression.isEmpty, "data_batch.value_format.compression"),
      (encoding.isEmpty, "data_batch.value_format.encoding"),
      (encryptedCompression.isEmpty, "data_batch_encrypted.value_format.compression"),
      (keyId.isEmpty, "encryption.key_id"),
      (userId.isEmpty, "access.user_id"),
      (applicationContext.isEmpty, "application_context"),
      (referenceId.isEmpty, "debug.reference_id")
    ).collect { case (true, name) => name }

    /** `GetValidationError` (`json_request.cpp:350-369,404-415,512-523`):
      * common missing fields first; only when those all pass, the
      * per-operation `Missing required field:` message.
      */
    def validationError: String = {
      val common = commonMissing ++
        (if (datatypeLengthStr.nonEmpty)
          Seq("data_batch.datatype_info.length (invalid integer value)") else Nil)
      if (common.nonEmpty) missingFieldsError(common)
      else if (value.isEmpty)
        s"Missing required field: ${if (encrypt) "data_batch.value" else "data_batch_encrypted.value"}"
      else ""
    }

    /** `ToJsonString` (`json_request.cpp:417-480,525-599`) — the client-side
      * builder; emits the exact nested shape the reference sends.
      */
    def toJson: String = {
      val root = mapper.createObjectNode()
      root.putObject("column_reference").put("name", columnName)

      val dataBatch = root.putObject("data_batch")
      val dtInfo = dataBatch.putObject("datatype_info")
      dtInfo.put("datatype", datatype.getOrElse(""))
      datatypeLength.foreach(dtInfo.put("length", _))
      if (encrypt) dataBatch.put("value", b64(value))
      val vf = dataBatch.putObject("value_format")
      vf.put("compression", compression.getOrElse(""))
      vf.put("encoding", encoding.getOrElse(""))
      if (encodingAttributes.nonEmpty)
        putStringMap(vf, "encoding_attributes", encodingAttributes)

      val dbe = root.putObject("data_batch_encrypted")
      if (!encrypt) dbe.put("value", b64(value))
      dbe.putObject("value_format")
        .put("compression", encryptedCompression.getOrElse(""))

      root.putObject("encryption").put("key_id", keyId)
      root.putObject("access").put("user_id", userId)
      root.put("application_context", applicationContext)
      root.putObject("debug").put("reference_id", referenceId)
      if (!encrypt) putStringMap(root, "encryption_metadata", encryptionMetadata)
      mapper.writeValueAsString(root)
    }
  }

  object ProtectRequest {
    /** Parse an `/encrypt` (`encrypt = true`) or `/decrypt` body. Malformed
      * JSON yields an all-missing request, exactly like the reference's
      * stop-parsing-on-invalid behavior.
      */
    def parse(body: String, encrypt: Boolean): ProtectRequest = {
      val root =
        try {
          val n = mapper.readTree(body)
          if (n == null || !n.isObject) null else n
        } catch { case _: Exception => null }

      def get(path: String*): Option[String] =
        if (root == null) None else safeGet(root, path: _*)

      val lengthRaw = get("data_batch", "datatype_info", "length")
      val lengthParsed = lengthRaw.map(stoiLike)
      val valueB64 =
        if (encrypt) get("data_batch", "value")
        else get("data_batch_encrypted", "value")

      ProtectRequest(
        encrypt = encrypt,
        columnName = get("column_reference", "name").getOrElse(""),
        datatype = get("data_batch", "datatype_info", "datatype").filter(Datatypes),
        datatypeLength = lengthParsed.flatten,
        datatypeLengthStr =
          if (lengthRaw.isDefined && lengthParsed.get.isEmpty) lengthRaw.get else "",
        compression =
          get("data_batch", "value_format", "compression").filter(Compressions),
        encoding = get("data_batch", "value_format", "encoding").filter(Encodings),
        encodingAttributes =
          if (root == null) Map.empty
          else stringMap(root.at("/data_batch/value_format/encoding_attributes")),
        encryptedCompression =
          get("data_batch_encrypted", "value_format", "compression").filter(Compressions),
        keyId = get("encryption", "key_id").getOrElse(""),
        userId = get("access", "user_id").getOrElse(""),
        applicationContext = get("application_context").getOrElse(""),
        referenceId = get("debug", "reference_id").getOrElse(""),
        value = valueB64.map(decodeBase64).getOrElse(Array.emptyByteArray),
        encryptionMetadata =
          if (encrypt || root == null) Map.empty
          else stringMap(root.get("encryption_metadata")))
    }
  }

  // -------------------------------------------------------------- responses --

  /** `/encrypt` 200 body (`EncryptJsonResponse`, `json_request.cpp:623-652,
    * 746-782`): `data_batch_encrypted.{value_format.compression,value}`,
    * `access.{user_id,role,access_control}`, `debug.reference_id`,
    * `encryption_metadata` (always present, `{}` when empty).
    */
  final case class EncryptResponse(
      encryptedCompression: String,
      encryptedValue: Array[Byte],
      userId: String,
      role: String,
      accessControl: String,
      referenceId: String,
      encryptionMetadata: Map[String, String]) {

    def toJson: String = {
      val root = mapper.createObjectNode()
      val dbe = root.putObject("data_batch_encrypted")
      dbe.putObject("value_format").put("compression", encryptedCompression)
      dbe.put("value", b64(encryptedValue))
      val access = root.putObject("access")
      access.put("user_id", userId)
      access.put("role", role)
      access.put("access_control", accessControl)
      root.putObject("debug").put("reference_id", referenceId)
      putStringMap(root, "encryption_metadata", encryptionMetadata)
      mapper.writeValueAsString(root)
    }
  }

  object EncryptResponse {
    /** Client-side parse + `IsValid` (`json_request.cpp:724-728`): Left is
      * the api-client error the reference raises for an invalid body.
      */
    def parse(body: String): Either[String, EncryptResponse] = {
      val root =
        try {
          val n = mapper.readTree(body)
          if (n == null || !n.isObject) return Left("Invalid JSON encrypt response") else n
        } catch { case _: Exception => return Left("Invalid JSON encrypt response") }
      val r = EncryptResponse(
        encryptedCompression =
          safeGet(root, "data_batch_encrypted", "value_format", "compression")
            .filter(Compressions).getOrElse(""),
        encryptedValue = safeGet(root, "data_batch_encrypted", "value")
          .map(decodeBase64).getOrElse(Array.emptyByteArray),
        userId = safeGet(root, "access", "user_id").getOrElse(""),
        role = safeGet(root, "access", "role").getOrElse(""),
        accessControl = safeGet(root, "access", "access_control").getOrElse(""),
        referenceId = safeGet(root, "debug", "reference_id").getOrElse(""),
        encryptionMetadata = stringMap(root.get("encryption_metadata")))
      val valid = r.userId.nonEmpty && r.role.nonEmpty && r.accessControl.nonEmpty &&
        r.referenceId.nonEmpty && r.encryptedCompression.nonEmpty && r.encryptedValue.nonEmpty
      if (!valid) Left("Invalid JSON encrypt response") else Right(r)
    }
  }

  /** `/decrypt` 200 body (`DecryptJsonResponse`, `json_request.cpp:654-693,
    * 822-859`): the decrypted `data_batch` with datatype/value_format echo,
    * plus the same access/debug stamping.
    */
  final case class DecryptResponse(
      datatype: String,
      datatypeLength: Option[Int],
      compression: String,
      encoding: String,
      value: Array[Byte],
      userId: String,
      role: String,
      accessControl: String,
      referenceId: String) {

    def toJson: String = {
      val root = mapper.createObjectNode()
      val dataBatch = root.putObject("data_batch")
      val dtInfo = dataBatch.putObject("datatype_info")
      dtInfo.put("datatype", datatype)
      datatypeLength.foreach(dtInfo.put("length", _))
      dataBatch.put("value", b64(value))
      val vf = dataBatch.putObject("value_format")
      vf.put("compression", compression)
      vf.put("encoding", encoding)
      val access = root.putObject("access")
      access.put("user_id", userId)
      access.put("role", role)
      access.put("access_control", accessControl)
      root.putObject("debug").put("reference_id", referenceId)
      mapper.writeValueAsString(root)
    }
  }

  object DecryptResponse {
    def parse(body: String): Either[String, DecryptResponse] = {
      val root =
        try {
          val n = mapper.readTree(body)
          if (n == null || !n.isObject) return Left("Invalid JSON decrypt response") else n
        } catch { case _: Exception => return Left("Invalid JSON decrypt response") }
      val r = DecryptResponse(
        datatype = safeGet(root, "data_batch", "datatype_info", "datatype")
          .filter(Datatypes).getOrElse(""),
        datatypeLength = safeGet(root, "data_batch", "datatype_info", "length")
          .flatMap(stoiLike),
        compression = safeGet(root, "data_batch", "value_format", "compression")
          .filter(Compressions).getOrElse(""),
        encoding = safeGet(root, "data_batch", "value_format", "encoding")
          .filter(Encodings).getOrElse(""),
        value = safeGet(root, "data_batch", "value")
          .map(decodeBase64).getOrElse(Array.emptyByteArray),
        userId = safeGet(root, "access", "user_id").getOrElse(""),
        role = safeGet(root, "access", "role").getOrElse(""),
        accessControl = safeGet(root, "access", "access_control").getOrElse(""),
        referenceId = safeGet(root, "debug", "reference_id").getOrElse(""))
      val valid = r.userId.nonEmpty && r.role.nonEmpty && r.accessControl.nonEmpty &&
        r.referenceId.nonEmpty && r.datatype.nonEmpty && r.compression.nonEmpty &&
        r.encoding.nonEmpty && r.value.nonEmpty
      if (!valid) Left("Invalid JSON decrypt response") else Right(r)
    }
  }
}
