package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal JSON-Schema (draft-07 subset) validator for the vendored
  * Vega-Lite schema (round-12 verdict #7). Supports exactly the keywords
  * that schema uses — `type`, `const`, `enum`, `required`, `properties`,
  * `additionalProperties: false`, `items`, `oneOf`, and local
  * `$ref: "#/definitions/..."` — and FAILS LOUDLY on any keyword it does
  * not know, so a future schema edit can't silently validate nothing.
  * Jackson comes from the Spark runtime classpath (no new dependency).
  */
object JsonSchema {

  private val Known = Set("type", "const", "enum", "required", "properties",
    "additionalProperties", "items", "oneOf", "$ref", "definitions",
    "$comment")

  private val mapper = new ObjectMapper()

  def parse(s: String): JsonNode = mapper.readTree(s)

  /** Violations of `instanceJson` against `schemaJson`; empty = valid. */
  def validate(schemaJson: String, instanceJson: String): Seq[String] =
    check(parse(schemaJson), parse(schemaJson), parse(instanceJson), "$")

  private def resolve(root: JsonNode, ref: String): JsonNode = {
    require(ref.startsWith("#/"), s"only local refs supported: $ref")
    ref.drop(2).split("/").foldLeft(root) { (n, p) =>
      val c = n.get(p)
      require(c != null, s"dangling $$ref: $ref")
      c
    }
  }

  private def typeName(n: JsonNode): String =
    if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "string"
    else if (n.isNumber) "number"
    else if (n.isBoolean) "boolean"
    else "null"

  private def check(root: JsonNode, sch: JsonNode, inst: JsonNode,
      path: String): Seq[String] = {
    sch.fieldNames.asScala.foreach(k =>
      require(Known(k), s"unsupported schema keyword: $k"))
    if (sch.has("$ref"))
      return check(root, resolve(root, sch.get("$ref").asText), inst, path)
    val errs = Seq.newBuilder[String]
    if (sch.has("const") && sch.get("const") != inst)
      errs += s"$path: expected const ${sch.get("const")}, got $inst"
    if (sch.has("enum") &&
        !sch.get("enum").elements.asScala.contains(inst))
      errs += s"$path: $inst not in enum ${sch.get("enum")}"
    if (sch.has("type")) {
      val t = sch.get("type").asText
      val ok =
        if (t == "integer") inst.isIntegralNumber else typeName(inst) == t
      if (!ok) errs += s"$path: expected type $t, got ${typeName(inst)}"
    }
    if (sch.has("oneOf")) {
      val subs = sch.get("oneOf").elements.asScala.toSeq
      val passes = subs.count(s => check(root, s, inst, path).isEmpty)
      if (passes != 1)
        errs += s"$path: matched $passes of ${subs.size} oneOf branches " +
          "(need exactly 1)"
    }
    if (inst.isObject) {
      if (sch.has("required"))
        sch.get("required").elements.asScala.foreach { r =>
          if (!inst.has(r.asText))
            errs += s"$path: missing required property ${r.asText}"
        }
      val props = Option(sch.get("properties"))
      val addl = Option(sch.get("additionalProperties"))
      inst.fields.asScala.foreach { e =>
        props.flatMap(p => Option(p.get(e.getKey))) match {
          case Some(ps) =>
            errs ++= check(root, ps, e.getValue, s"$path.${e.getKey}")
          case None =>
            if (addl.exists(a => a.isBoolean && !a.asBoolean))
              errs += s"$path: additional property ${e.getKey} not allowed"
        }
      }
    }
    if (inst.isArray && sch.has("items"))
      inst.elements.asScala.zipWithIndex.foreach { case (el, i) =>
        errs ++= check(root, sch.get("items"), el, s"$path[$i]")
      }
    errs.result()
  }
}
