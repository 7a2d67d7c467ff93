package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Boundary codecs — the analog of the reference's protocol system
  * (mrjob/protocol.py; slot selection mrjob/job.py:1052-1076).
  *
  * Inside the engine there are NO line protocols: Tungsten/Encoders
  * replace the per-hop JSON encode/decode that the reference concedes
  * is its hot spot (mrjob/protocol.py:28-30). Protocols exist only at
  * the edges — reading line-oriented input and writing mrjob-style
  * `json(key)\tjson(value)` output — mirroring the harness's own
  * `--skip-internal-protocol` optimization
  * (mrjob/spark/harness.py:118-124, 679-685).
  *
  * | reference protocol (mrjob/protocol.py)        | here |
  * |---|---|
  * | JSONProtocol (:265)       | [[JsonPairProtocol]] |
  * | JSONValueProtocol (:272)  | [[JsonValueProtocol]] |
  * | TextProtocol (:393)       | [[TextPairProtocol]] |
  * | RawValueProtocol (:454)   | [[RawValueProtocol]] |
  * | BytesProtocol (:349)      | binary Datasets (no line form needed) |
  * | PickleProtocol (:284)     | typed Dataset[T] + Kryo encoders |
  */
trait LineProtocol[K, V] extends Serializable {
  def read(line: String): (K, V)
  def write(k: K, v: V): String
}

/** Dynamic JSON values (the mrjob default internal/output encoding).
  * Keys/values are json4s JValues — the Scala stand-in for "arbitrary
  * JSON-encodable Python value" (mrjob/job.py:274-275). */
object JsonPairProtocol extends LineProtocol[JValue, JValue] {
  def read(line: String): (JValue, JValue) = {
    val i = line.indexOf('\t')
    require(i >= 0, s"no tab in JSON pair line: $line")
    (JsonMethods.parse(line.substring(0, i)),
      JsonMethods.parse(line.substring(i + 1)))
  }
  def write(k: JValue, v: JValue): String =
    JsonMethods.compact(JsonMethods.render(k)) + "\t" +
      JsonMethods.compact(JsonMethods.render(v))
}

/** Value-only JSON lines; key reads as JNull
  * (JSONValueProtocol, mrjob/protocol.py:272-281). */
object JsonValueProtocol extends LineProtocol[JValue, JValue] {
  def read(line: String): (JValue, JValue) =
    (JNull, JsonMethods.parse(line))
  def write(k: JValue, v: JValue): String =
    JsonMethods.compact(JsonMethods.render(v))
}

/** Tab-separated UTF-8 text pairs (TextProtocol,
  * mrjob/protocol.py:393-451). Splits on the FIRST tab, like
  * protocol.py:91. */
object TextPairProtocol extends LineProtocol[String, String] {
  def read(line: String): (String, String) = {
    val i = line.indexOf('\t')
    if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
  }
  def write(k: String, v: String): String = s"$k\t$v"
}

/** Whole line as value, key = null (RawValueProtocol,
  * mrjob/job.py:1270 — the default first-step input). */
object RawValueProtocol extends LineProtocol[String, String] {
  def read(line: String): (String, String) = (null, line)
  def write(k: String, v: String): String = v
}
