package graft.operators

import graft.conf.GluestickConf

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._
import scala.util.Try

/** Driver-side string templating + tenant metadata (U1-U3,
  * ref: src/etl-utils.ts:101-183). Pure Scala — no Catalyst surface.
  */
object Templating {

  /** `{key}` substitution; only truthy values replace, unknown keys stay
    * literal (ref: src/etl-utils.ts:161-175 formatStrSafely).
    */
  def formatStrSafely(
      strToFormat: String,
      formatVariables: Map[String, String]): String =
    formatVariables.foldLeft(strToFormat) { case (acc, (k, v)) =>
      if (v == null || v.isEmpty) acc
      else acc.replace(s"{$k}", v)
    }

  /** Template-variable environment (ref: src/etl-utils.ts:101-159
    * buildStringFormatVariables): tenant metadata from
    * `{ROOT}/snapshots/tenant-config.json` (reserved keys win), env-derived
    * flow/job/tap/connector/tenant/env ids, tenant split into
    * root/sub on `subtenantDelimiter`.
    */
  def buildStringFormatVariables(
      defaultKwargs: Map[String, String] = Map.empty,
      useTenantMetadata: Boolean = true,
      subtenantDelimiter: String = "_",
      conf: GluestickConf = GluestickConf.fromEnv()): Map[String, String] = {
    val reservedKeys = defaultKwargs.keySet
    val tenantMeta: Map[String, String] =
      if (!useTenantMetadata) Map.empty
      else {
        val path = java.nio.file.Paths.get(
          conf.root, "snapshots", "tenant-config.json")
        if (!java.nio.file.Files.exists(path)) Map.empty
        else
          Try {
            val node = new ObjectMapper().readTree(path.toFile)
            Option(node.get("hotglue_metadata"))
              .flatMap(n => Option(n.get("metadata")))
              .map(_.fields().asScala.map(e =>
                e.getKey -> e.getValue.asText).toMap)
              .getOrElse(Map.empty)
          }.getOrElse(Map.empty)
      }
    val fromMeta = tenantMeta.filterNot { case (k, _) => reservedKeys(k) }

    val tenantId = conf.tenant
    val split = tenantId.split(java.util.regex.Pattern.quote(subtenantDelimiter))
    val rootTenantId = split.headOption.getOrElse("")
    val subTenantId = if (split.length > 1) split(1) else ""

    defaultKwargs ++ fromMeta ++ Map(
      "tenant" -> tenantId,
      "tenant_id" -> tenantId,
      "root_tenant_id" -> rootTenantId,
      "sub_tenant_id" -> subTenantId,
      "env_id" -> conf.envId,
      "flow_id" -> conf.flowId,
      "job_id" -> conf.jobId,
      "tap" -> conf.tap,
      "connector" -> conf.connectorId)
  }

  /** Null-safe index (ref: src/etl-utils.ts:177-183). Columnar analogue:
    * `try_element_at`.
    */
  def getIndexSafely[T](arr: Seq[T], index: Int): Option[T] =
    arr.lift(index)
}
