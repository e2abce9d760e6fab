package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Translate the reference's cross-backend `storage_options` dictionary
  * (deltalake2db duckdb.py:241-311, azure_helper.py:36-71) onto Spark's
  * Hadoop configuration for the ABFS connector — one options object
  * drives every path, exactly like the reference drives DuckDB secrets /
  * fsspec / object_store from one dict.
  *
  * Supported keys (the reference's set): `account_name`, `account_key`,
  * `sas_token`, `connection_string`, `client_id`+`client_secret`+
  * `tenant_id` (service principal), `use_emulator`, `anon`, `chain`
  * (managed_identity / default / cli / env).
  *
  * Offline environment: translation is unit-tested; no live Azure test
  * (mirrors the reference's Azurite-only CI).
  */
object AzureStorageOptions {

  val EmulatorAccountName = "devstoreaccount1"
  val EmulatorAccountKey: String =
    "Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4I6tq/K1SZFPTOtr/KBHBeksoGMGw=="

  /** Parse an `AccountName=...;AccountKey=...` connection string. */
  private[sources] def parseConnectionString(cs: String): Map[String, String] =
    cs.split(";").filter(_.contains("=")).map { kv =>
      val i = kv.indexOf('=')
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap

  /** Hadoop conf entries for one account given the options map. Returns
    * (confEntries, accountSuffix) — entries are scoped per-account, so
    * several tables with different accounts coexist in one session.
    */
  def toHadoopConf(
      options: Map[String, String],
      endpointSuffix: String = "dfs.core.windows.net"): Map[String, String] = {
    def opt(k: String): Option[String] = options.get(k).filter(_.nonEmpty)
    val useEmulator = opt("use_emulator").exists(v =>
      Set("1", "true", "True").contains(v))

    val fromCs = opt("connection_string").map(parseConnectionString)
    val accountName = fromCs.flatMap(_.get("AccountName"))
      .orElse(opt("account_name"))
      .orElse(if (useEmulator) Some(EmulatorAccountName) else None)
      .getOrElse(throw new IllegalArgumentException(
        "storage_options needs account_name or connection_string"))
    val host = s"$accountName.$endpointSuffix"

    val accountKey = fromCs.flatMap(_.get("AccountKey"))
      .orElse(opt("account_key"))
      .orElse(if (useEmulator) Some(EmulatorAccountKey) else None)

    val base = Map.newBuilder[String, String]
    accountKey match {
      case Some(key) =>
        base += s"fs.azure.account.auth.type.$host" -> "SharedKey"
        base += s"fs.azure.account.key.$host" -> key
      case None => opt("sas_token") match {
        case Some(sas) =>
          base += s"fs.azure.account.auth.type.$host" -> "SAS"
          base += s"fs.azure.sas.fixed.token.$host" -> sas
        case None =>
          (opt("client_id"), opt("client_secret"), opt("tenant_id")) match {
            case (Some(cid), Some(secret), Some(tenant)) =>
              base += s"fs.azure.account.auth.type.$host" -> "OAuth"
              base += s"fs.azure.account.oauth.provider.type.$host" ->
                "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
              base += s"fs.azure.account.oauth2.client.id.$host" -> cid
              base += s"fs.azure.account.oauth2.client.secret.$host" -> secret
              base += s"fs.azure.account.oauth2.client.endpoint.$host" ->
                s"https://login.microsoftonline.com/$tenant/oauth2/token"
            case _ =>
              val chain = opt("chain").getOrElse(
                if (opt("anon").contains("true")) "anon" else "default")
              chain.split(";").head match {
                case "managed_identity" =>
                  base += s"fs.azure.account.auth.type.$host" -> "OAuth"
                  base += s"fs.azure.account.oauth.provider.type.$host" ->
                    "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider"
                case "anon" =>
                  () // no credentials: public container
                case _ =>
                  // default/cli/env → workload-identity-style default chain
                  base += s"fs.azure.account.auth.type.$host" -> "OAuth"
                  base += s"fs.azure.account.oauth.provider.type.$host" ->
                    "org.apache.hadoop.fs.azurebfs.oauth2.WorkloadIdentityTokenProvider"
              }
          }
      }
    }
    if (useEmulator) {
      base += s"fs.azure.abfs.endpoint.$host" -> "http://127.0.0.1:10000"
      base += "fs.azure.always.use.https" -> "false"
    }
    base.result()
  }

  /** Apply to a live session (Hadoop conf is session-global, entries are
    * per-account-host so repeated calls for different accounts compose).
    */
  def apply(spark: SparkSession, options: Map[String, String]): Unit =
    applyTo(spark.sparkContext.hadoopConfiguration, options)

  def applyTo(conf: Configuration, options: Map[String, String]): Unit =
    toHadoopConf(options).foreach { case (k, v) => conf.set(k, v) }

  /** `az://container/path` + account → abfss URI, mirroring the
    * reference's path normalization (azure_helper.py:83-138).
    */
  def normalizeUri(path: String, options: Map[String, String]): String = {
    if (path.startsWith("az://")) {
      val rest = path.stripPrefix("az://")
      val container = rest.takeWhile(_ != '/')
      val sub = rest.dropWhile(_ != '/').stripPrefix("/")
      val account = options.get("account_name").filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(
          "az:// paths need account_name in storage options"))
      s"abfss://$container@$account.dfs.core.windows.net/$sub"
    } else if (path.contains(".blob.core.windows.net")) {
      // https://account.blob.core.windows.net/container/path → abfss
      val u = new java.net.URI(path)
      val account = u.getHost.split('.').head
      val parts = u.getPath.stripPrefix("/").split("/", 2)
      val sub = if (parts.length > 1) parts(1) else ""
      s"abfss://${parts(0)}@$account.dfs.core.windows.net/$sub"
    } else path
  }
}
