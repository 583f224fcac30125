package graft.conf

/** The engine's environment-variable configuration surface.
  *
  * The reference scatters env reads across modules (ref: src/reader.ts:26-27
  * `ROOT_DIR`; src/etl-utils.ts:24-31 `DEFAULT_EXPORT_FORMAT`,
  * `OUTPUT_FILE_PREFIX`, `HG_UNIFIED_OUTPUT_*`; src/etl-utils.ts:111-140
  * `ROOT`, `FLOW`, `JOB_ID`, `TAP`, `CONNECTOR_ID`, `TENANT`, `ENV_ID`;
  * src/singer.ts:307 `USE_CATALOG_SCHEMA`). We centralize them behind one
  * immutable value so tests can inject an env instead of mutating the JVM's.
  */
final case class GluestickConf(env: Map[String, String]) {

  /** ref: src/reader.ts:26 */
  def rootDir: String = env.getOrElse("ROOT_DIR", ".")

  /** ref: src/reader.ts:27 */
  def inputDir: String = s"$rootDir/sync-output"

  /** Base dir for tenant metadata, ref: src/etl-utils.ts:112 */
  def root: String = env.getOrElse("ROOT", ".")

  /** ref: src/etl-utils.ts:24 */
  def defaultExportFormat: String =
    env.getOrElse("DEFAULT_EXPORT_FORMAT", "singer")

  /** ref: src/etl-utils.ts:25 */
  def outputFilePrefix: Option[String] = env.get("OUTPUT_FILE_PREFIX")

  /** Per-stream output-name override, ref: src/etl-utils.ts:30-31 */
  def unifiedOutputName(name: String): Option[String] =
    env.get(s"HG_UNIFIED_OUTPUT_${name.toUpperCase}")

  /** ref: src/singer.ts:307 */
  def useCatalogSchema: Boolean =
    env.get("USE_CATALOG_SCHEMA").exists(_.equalsIgnoreCase("true"))

  /** Template-variable env surface, ref: src/etl-utils.ts:135-156. */
  def tenant: String = env.getOrElse("TENANT", "")
  def flowId: String = env.getOrElse("FLOW", "")
  def jobId: String = env.getOrElse("JOB_ID", "")
  def tap: String = env.getOrElse("TAP", "")
  def connectorId: String = env.getOrElse("CONNECTOR_ID", "")
  def envId: String = env.getOrElse("ENV_ID", "")
}

object GluestickConf {
  /** Production conf: the real process environment. */
  def fromEnv(): GluestickConf = GluestickConf(sys.env)
}
