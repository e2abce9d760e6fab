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
/** User-suppliable token credential — the analogue of azure-identity's
  * `TokenCredential` in the reference's `get_credential` hook
  * (azure_helper.py:11-33,83-138): the user injects their own credential
  * for a chain element instead of the built-in environment chains.
  */
trait TokenCredential {
  def getToken(scope: String): String
}

object AzureStorageOptions {

  val EmulatorAccountName = "devstoreaccount1"
  val EmulatorAccountKey: String =
    "Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4I6tq/K1SZFPTOtr/KBHBeksoGMGw=="

  /** The OAuth scope tokens are pre-fetched for (azure_helper.py:8). */
  val StorageScope = "https://storage.azure.com/.default"

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
      case None => opt("sas_token")
          .orElse(fromCs.flatMap(_.get("SharedAccessSignature"))) match {
        case Some(sas) =>
          base += s"fs.azure.account.auth.type.$host" -> "SAS"
          base += s"fs.azure.sas.fixed.token.$host" -> sas
        case None if opt("token").isDefined =>
          // pre-fetched bearer token from resolveOptions' credential
          // chain: Custom auth, token stashed for the deployment's
          // CustomTokenProviderAdaptee shim (see resolveOptions doc)
          base += s"fs.azure.account.auth.type.$host" -> "Custom"
          base += s"fs.graft.azure.static.token.$host" -> opt("token").get
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
              // Hadoop-ABFS static conf can name exactly ONE provider
              // class, so only the chain's FIRST element maps here —
              // multi-element fallback semantics need the
              // [[resolveOptions]] path, which walks the chain through
              // the credential hook and pre-fetches a token instead
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

  /** Resolve (path, options) with a user credential hook — the
    * reference's `get_storage_options_object_store`
    * (azure_helper.py:85-138): strip the account host out of
    * blob/dfs-URL paths into `account_name`, and when a `chain` is
    * requested (explicitly, or implicitly via `anon=false`), resolve it
    * element-by-element through `getCredential` — first element the hook
    * supplies wins — and PRE-FETCH the bearer token into the returned
    * options as `token`.
    *
    * Offline parity note: the reference falls back to azure-identity's
    * environment chains (cli/env/managed_identity/default) when the hook
    * returns None for an element; those require a live Azure context, so
    * here an unresolvable chain raises. Wiring the pre-fetched `token`
    * into Hadoop-ABFS needs a `CustomTokenProviderAdaptee` shim from
    * hadoop-azure (not on this classpath); [[toHadoopConf]] marks the
    * account `Custom`-auth and carries the token under
    * `fs.graft.azure.static.token.<host>` for such a shim to read.
    */
  def resolveOptions(
      path: String,
      options: Map[String, String],
      getCredential: String => Option[TokenCredential] = _ => None)
      : (String, Map[String, String]) = {
    val isAzureUrl = path.contains(".blob.core.windows.net") ||
      path.contains(".dfs.core.windows.net")
    // host-stripped paths are emitted in the CANONICAL az://container/…
    // form regardless of the input scheme: the az form is what
    // [[normalizeUri]] consumes, while e.g. `https://container/path`
    // (the old scheme-preserving strip) is a dead-end URI nothing
    // downstream can read
    val (newPath, accountFromUrl) =
      if (isAzureUrl) {
        val u = new java.net.URI(path)
        val account = u.getHost.split('.').head
        (s"az://${u.getPath.stripPrefix("/")}", Some(account))
      } else (path, None)

    val anon = options.get("anon").map(_.toLowerCase)
    val chainOpt = options.get("chain").orElse(
      if (anon.exists(Set("0", "false"))) Some("default") else None)

    val resolved = chainOpt match {
      case Some(chain) =>
        val cred = chain.split(";").toSeq.flatMap(c => getCredential(c))
          .headOption.getOrElse(throw new IllegalArgumentException(
            s"No credential available for chain '$chain' " +
              "(supply one via getCredential)"))
        options - "chain" - "anon" + ("token" -> cred.getToken(StorageScope))
      case None =>
        if (anon.exists(Set("1", "true"))) options - "anon" else options
    }
    val withAccount = accountFromUrl match {
      case Some(a) if !resolved.contains("account_name") =>
        resolved + ("account_name" -> a)
      case _ => resolved
    }
    (newPath, withAccount)
  }

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
