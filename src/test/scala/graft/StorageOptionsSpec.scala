package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AzureStorageOptions

/** Ports of the reference's credential-translation unit tests
  * (tests/test_azure_helper.py:12-49) onto the Hadoop-conf mapping.
  */
class StorageOptionsSpec extends AnyFunSuite {

  private val host = "acct.dfs.core.windows.net"

  test("account key → SharedKey auth") {
    val c = AzureStorageOptions.toHadoopConf(
      Map("account_name" -> "acct", "account_key" -> "k1"))
    assert(c(s"fs.azure.account.auth.type.$host") == "SharedKey")
    assert(c(s"fs.azure.account.key.$host") == "k1")
  }

  test("connection string is parsed for name and key") {
    val c = AzureStorageOptions.toHadoopConf(
      Map("connection_string" ->
        "DefaultEndpointsProtocol=https;AccountName=acct;AccountKey=csk=="))
    assert(c(s"fs.azure.account.key.$host") == "csk==")
  }

  test("SAS inside a connection string is honored (no silent OAuth fallback)") {
    val c = AzureStorageOptions.toHadoopConf(
      Map("connection_string" ->
        "AccountName=acct;SharedAccessSignature=sv=2022&sig=y"))
    assert(c(s"fs.azure.account.auth.type.$host") == "SAS")
    assert(c(s"fs.azure.sas.fixed.token.$host") == "sv=2022&sig=y")
  }

  test("sas token → SAS auth") {
    val c = AzureStorageOptions.toHadoopConf(
      Map("account_name" -> "acct", "sas_token" -> "sv=2020&sig=x"))
    assert(c(s"fs.azure.account.auth.type.$host") == "SAS")
    assert(c(s"fs.azure.sas.fixed.token.$host") == "sv=2020&sig=x")
  }

  test("service principal → OAuth client credentials") {
    val c = AzureStorageOptions.toHadoopConf(Map(
      "account_name" -> "acct", "client_id" -> "cid",
      "client_secret" -> "sec", "tenant_id" -> "tid"))
    assert(c(s"fs.azure.account.auth.type.$host") == "OAuth")
    assert(c(s"fs.azure.account.oauth2.client.endpoint.$host")
      .contains("tid"))
  }

  test("emulator defaults to well-known devstore account") {
    val h = s"${AzureStorageOptions.EmulatorAccountName}.dfs.core.windows.net"
    val c = AzureStorageOptions.toHadoopConf(Map("use_emulator" -> "1"))
    assert(c(s"fs.azure.account.key.$h") == AzureStorageOptions.EmulatorAccountKey)
    assert(c("fs.azure.always.use.https") == "false")
  }

  test("managed identity chain → MSI provider") {
    val c = AzureStorageOptions.toHadoopConf(
      Map("account_name" -> "acct", "chain" -> "managed_identity"))
    assert(c(s"fs.azure.account.oauth.provider.type.$host")
      .contains("MsiTokenProvider"))
  }

  test("anon → no auth entries") {
    val c = AzureStorageOptions.toHadoopConf(
      Map("account_name" -> "acct", "anon" -> "true"))
    assert(!c.contains(s"fs.azure.account.auth.type.$host"))
  }

  // --- credential hook: reference tests/test_azure_helper.py:12-49 ---

  private object FakeCredential extends graft.sources.TokenCredential {
    def getToken(scope: String): String = "fake_token"
  }

  test("credential hook: chain resolves through the user credential") {
    for (opts <- Seq(Map("chain" -> "default"), Map("anon" -> "false"))) {
      val (newPath, creds) = AzureStorageOptions.resolveOptions(
        "az://accountnamethatslong.blob.core.windows.net/testlakedb/td/delta/fake",
        opts, _ => Some(FakeCredential))
      assert(!newPath.contains(".blob.core") && !newPath.contains(".dfs.core"))
      assert(newPath == "az://testlakedb/td/delta/fake")
      assert(creds("token") == "fake_token")
      assert(creds("account_name") == "accountnamethatslong")

      val (p2, c2) = AzureStorageOptions.resolveOptions(
        "abfss://accountnamethatslong.dfs.core.windows.net/testlakedb/td/delta/fake",
        opts, _ => Some(FakeCredential))
      assert(p2 == "az://testlakedb/td/delta/fake") // canonical az form
      assert(c2("token") == "fake_token")
      assert(c2("account_name") == "accountnamethatslong")
    }
  }

  test("credential hook: first chain element the hook supplies wins") {
    var asked = List.empty[String]
    val (_, creds) = AzureStorageOptions.resolveOptions(
      "az://c/p", Map("chain" -> "cli;managed_identity", "account_name" -> "a"),
      c => { asked :+= c; if (c == "managed_identity") Some(FakeCredential) else None })
    assert(asked == List("cli", "managed_identity"))
    assert(creds("token") == "fake_token")
    assert(!creds.contains("chain"))
  }

  test("credential hook: unresolvable chain raises; anon passes through") {
    intercept[IllegalArgumentException] {
      AzureStorageOptions.resolveOptions(
        "az://c/p", Map("chain" -> "env", "account_name" -> "a"))
    }
    val (_, c) = AzureStorageOptions.resolveOptions(
      "az://c/p", Map("anon" -> "true", "account_name" -> "a"))
    assert(!c.contains("anon") && !c.contains("token"))
  }

  test("pre-fetched token maps to Custom auth with stashed token") {
    val c = AzureStorageOptions.toHadoopConf(
      Map("account_name" -> "acct", "token" -> "tok123"))
    assert(c(s"fs.azure.account.auth.type.$host") == "Custom")
    assert(c(s"fs.graft.azure.static.token.$host") == "tok123")
  }

  test("az:// and https blob URIs normalize to abfss") {
    val opts = Map("account_name" -> "acct")
    assert(AzureStorageOptions.normalizeUri("az://cont/a/b", opts) ==
      "abfss://cont@acct.dfs.core.windows.net/a/b")
    assert(AzureStorageOptions.normalizeUri(
      "https://acct.blob.core.windows.net/cont/a/b", opts) ==
      "abfss://cont@acct.dfs.core.windows.net/a/b")
    assert(AzureStorageOptions.normalizeUri("/local/path", opts) == "/local/path")
  }
}
