package graft.catalog

import java.io.InputStream
import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** The REST spec's OTHER access-delegation flavor: `remote-signing`. A
  * catalog that will not vend storage keys instead signs each storage
  * request for the client — the client POSTs an S3SignRequest to the
  * signer endpoint (the spec's `s3-signer-open-api` contract:
  * `POST {s3.signer.uri}/{s3.signer.endpoint}` with
  * `{region, method, uri, headers}`), receives the signed header set, and
  * issues the storage request with those headers attached. The reference
  * client has no delegation at all (its loadTable sends no
  * X-Iceberg-Access-Delegation header, rest.go:388-416); this build
  * supports both flavors.
  *
  * Everything here is DRIVEN BY STRING PROPERTIES (`s3.signer.*` in a
  * table's ioProps) so executor-side planners (DistributedPlanner
  * broadcasts ioProps, never live objects) can rebuild the signing client
  * and sign their own manifest reads — at 1000 executors the driver must
  * not proxy data-plane IO.
  *
  * Auth: sign requests carry the catalog's bearer token
  * (`s3.signer.token`, injected at loadTable time); on 401/419 the client
  * re-mints ONCE from `s3.signer.credential` via the signer's OAuth route
  * — the same self-heal the catalog plane does, which is what lets a
  * long-lived scan survive signer-token expiry without a driver roundtrip. */
object SignedHttpIO {

  /** ioProps keys — the public Iceberg AWS property names plus the two
    * client-injected auth entries. */
  val RemoteSigningEnabled = "s3.remote-signing-enabled"
  val SignerUri = "s3.signer.uri"
  val SignerEndpoint = "s3.signer.endpoint"
  val DefaultSignerEndpoint = "v1/aws/s3/sign"
  val SignerToken = "s3.signer.token"
  val SignerCredential = "s3.signer.credential"

  /** True when `props` declare remote signing AND no storage key was
    * vended — a vended credential always wins (it needs no per-request
    * signer roundtrip). */
  def shouldSign(props: Map[String, String]): Boolean =
    props.get(RemoteSigningEnabled).exists(_.equalsIgnoreCase("true")) &&
      props.contains(SignerUri) && !props.contains("s3.access-key-id")

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  /** Resolve the STORAGE url for a table path: http(s) paths go as-is;
    * `s3://bucket/key` maps path-style under the configured `s3.endpoint`
    * (how a signer-fronted store like MinIO/S3 is addressed when the
    * catalog signs instead of vending keys). */
  def storageUrl(path: String, props: Map[String, String]): String = {
    val scheme = URI.create(path).getScheme
    if (scheme == "http" || scheme == "https") path
    else if (scheme == "s3") {
      val ep = props.getOrElse("s3.endpoint", throw new IllegalArgumentException(
        s"remote-signing read of '$path' needs s3.endpoint"))
      val rest = path.stripPrefix("s3://")
      s"${ep.stripSuffix("/")}/$rest"
    } else throw new IllegalArgumentException(
      s"remote signing cannot route scheme '$scheme' ($path)")
  }

  /** Sign `method uri` through the signer and return the headers to attach
    * to the storage request (plus the possibly-rewritten uri — the spec
    * lets the signer redirect). */
  def sign(method: String, uri: String, props: Map[String, String],
           token: Option[String]): (String, Map[String, Seq[String]]) = {
    val base = props(SignerUri).stripSuffix("/")
    val endpoint = props.getOrElse(SignerEndpoint, DefaultSignerEndpoint)
      .stripPrefix("/")
    val body = mapper.createObjectNode()
    body.put("region", props.getOrElse("s3.region",
      props.getOrElse("client.region", "us-east-1")))
    body.put("method", method)
    body.put("uri", uri)
    body.putObject("headers")
    var b = HttpRequest.newBuilder(URI.create(s"$base/$endpoint"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
    token.foreach(t => b = b.header("Authorization", s"Bearer $t"))
    val rsp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (rsp.statusCode() / 100 != 2)
      throw new RestError(rsp.statusCode(), s"signer refused: ${rsp.body()}")
    val n = mapper.readTree(rsp.body())
    val outUri = Option(n.get("uri")).map(_.asText()).getOrElse(uri)
    val headers = Option(n.get("headers")).map { h =>
      h.properties().asScala.map { e =>
        val vs = Vector.newBuilder[String]
        e.getValue.forEach(v => vs += v.asText())
        e.getKey -> vs.result()
      }.toMap
    }.getOrElse(Map.empty[String, Seq[String]])
    (outUri, headers)
  }

  /** Mint a fresh bearer token from `s3.signer.credential` via the
    * signer's OAuth route — the executor-side twin of the catalog's
    * client-credentials flow. */
  private def remintToken(props: Map[String, String]): Option[String] =
    props.get(SignerCredential).map { cred =>
      val (id, secret) = cred.split(":", 2) match {
        case Array(i, s) => (i, s)
        case Array(s) => ("", s)
      }
      def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)
      val base = props(SignerUri).stripSuffix("/")
      val form = s"grant_type=client_credentials&client_id=${enc(id)}" +
        s"&client_secret=${enc(secret)}&scope=catalog"
      val req = HttpRequest.newBuilder(URI.create(s"$base/v1/oauth/tokens"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form)).build()
      val rsp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (rsp.statusCode() != 200)
        throw new RestError(rsp.statusCode(), s"signer re-auth failed: ${rsp.body()}")
      mapper.readTree(rsp.body()).get("access_token").asText()
    }

  /** Open `path` through the signer: sign, then GET with the signed
    * headers. An expired/invalidated signer token self-heals once by
    * re-minting from the stored credential. */
  def open(path: String, props: Map[String, String]): InputStream = {
    val url = storageUrl(path, props)
    def fetch(token: Option[String]): HttpResponse[InputStream] = {
      val (uri, headers) = sign("GET", url, props, token)
      var b = HttpRequest.newBuilder(URI.create(uri)).GET()
      headers.foreach { case (k, vs) => vs.foreach(v => b = b.header(k, v)) }
      client.send(b.build(), HttpResponse.BodyHandlers.ofInputStream())
    }
    def attempt(token: Option[String], retried: Boolean): InputStream =
      try {
        val rsp = fetch(token)
        if (rsp.statusCode() / 100 != 2) {
          rsp.body().close()
          throw new RestError(rsp.statusCode(), s"storage GET $url failed")
        }
        rsp.body()
      } catch {
        case e: RestError if !retried =>
          // 401/419 anywhere in the handshake (sign or fetch): the bearer
          // token aged out — re-mint once and retry
          val msg = e.getMessage
          if (msg.contains("HTTP 401") || msg.contains("HTTP 419"))
            remintToken(props) match {
              case Some(fresh) => attempt(Some(fresh), retried = true)
              case None => throw e
            }
          else throw e
      }
    attempt(props.get(SignerToken), retried = false)
  }
}
