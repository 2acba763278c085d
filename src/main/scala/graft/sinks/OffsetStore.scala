package graft.sinks

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/**
 * Debezium-offset-compatible state blob (K5 migration path): the reference persists the
 * engine's offsets by base64-encoding the raw `FileOffsetBackingStore` file into component
 * state (`ex_postgres_cdc/src/component.py:286-288`) and writes it back verbatim on the
 * next run (`executor.py`). That file's format — Kafka Connect's `FileOffsetBackingStore` —
 * is a Java-serialized `HashMap<byte[], byte[]>` whose keys and values are UTF-8 JSON
 * (key: `["<engine-name>",{"server":"<topic-prefix>"}]`, value: the connector's offset
 * map, e.g. `{"lsn":…}` / `{"file":"…","pos":…}`).
 *
 * This writer/reader speaks that exact byte format, so:
 *  - a user migrating FROM the reference can hand graft the base64 blob out of their
 *    existing state.json and resume at the recorded source position;
 *  - graft's own state carries a `last_offset_b64` blob the reference engine could read.
 */
object OffsetStore {

  /** Serialize offsets as a `FileOffsetBackingStore`-format byte blob. */
  def encode(offsets: Map[String, String]): Array[Byte] = {
    val raw = new java.util.HashMap[Array[Byte], Array[Byte]]()
    offsets.foreach { case (k, v) => raw.put(k.getBytes(UTF_8), v.getBytes(UTF_8)) }
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    try { oos.writeObject(raw); oos.flush() } finally oos.close()
    bos.toByteArray
  }

  def encodeBase64(offsets: Map[String, String]): String =
    Base64.getEncoder.encodeToString(encode(offsets))

  /**
   * Deserialization filter: an offset blob imported from a foreign state.json is
   * attacker-controllable input, and Spark's classpath is rich in gadget chains. Kafka's own
   * `FileOffsetBackingStore` restricts deserialization to exactly `HashMap` and `byte[]`
   * for the same reason; mirror that allowlist here.
   */
  private val offsetBlobFilter =
    // byte[] passes implicitly (primitive component types are always allowed);
    // Map$Entry is HashMap.readObject's own internal checkArray probe
    java.io.ObjectInputFilter.Config.createFilter(
      "java.util.HashMap;java.util.Map$Entry;!*")

  def decode(bytes: Array[Byte]): Map[String, String] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    ois.setObjectInputFilter(offsetBlobFilter)
    try {
      val raw = ois.readObject().asInstanceOf[java.util.Map[Array[Byte], Array[Byte]]]
      import scala.jdk.CollectionConverters._
      raw.asScala.map { case (k, v) => new String(k, UTF_8) -> new String(v, UTF_8) }.toMap
    } finally ois.close()
  }

  def decodeBase64(s: String): Map[String, String] =
    decode(Base64.getDecoder.decode(s))

  /** Offset entry for a spool byte position, keyed the Kafka-Connect way. */
  def spoolOffsetEntry(engineName: String, serverName: String, pos: Long): (String, String) =
    (s"""["$engineName",{"server":"$serverName"}]""", s"""{"pos":$pos}""")
}
