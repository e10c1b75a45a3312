package graft.cdc

import java.net.Socket
import java.security.KeyStore
import java.security.cert.X509Certificate
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLSocket,
  TrustManager, X509TrustManager}

/** TLS transport for the live wire clients and the pgwire front-end —
  * every real deployment of the reference connects its peers over TLS
  * (connection setup in `flow/connectors/postgres/postgres.go`, the
  * `pg-tls`/`ch-tls` volumes in its compose files; tunnel transport in
  * `flow/shared/ssh.go`). The protocols differ only in WHERE the
  * upgrade happens:
  *
  *  - pgwire: SSLRequest before startup, single-byte 'S' answer, then
  *    TLS around the same socket ([[PgReplicationSource]],
  *    [[graft.server.PgServer]]).
  *  - MySQL: greeting arrives in plaintext; a short SSLRequest packet
  *    (capability flags incl. CLIENT_SSL, no user) upgrades, then the
  *    full handshake response repeats over TLS
  *    ([[MysqlSocketSource]]).
  *  - MongoDB: TLS from the first byte ([[MongoSocketSource]]).
  *
  * [[trustAllContext]] is `sslmode=require` semantics — encrypt the
  * channel, skip chain verification (the mode the reference defaults
  * to for peer URLs without a CA). Verified deployments pass their own
  * [[SSLContext]] built from a real trust store.
  */
object Tls {

  /** Encrypt-only context (no peer verification) — the
    * `sslmode=require` posture. MITM-safe deployments must supply a
    * verifying context instead. */
  lazy val trustAllContext: SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array[TrustManager](new X509TrustManager {
      override def checkClientTrusted(
          chain: Array[X509Certificate], authType: String): Unit = ()
      override def checkServerTrusted(
          chain: Array[X509Certificate], authType: String): Unit = ()
      override def getAcceptedIssuers: Array[X509Certificate] =
        Array.empty
    }), null)
    ctx
  }

  /** Wrap an already-connected plaintext socket in client-mode TLS and
    * complete the handshake. */
  def clientUpgrade(sock: Socket, host: String, port: Int,
      ctx: SSLContext): SSLSocket = {
    val tls = ctx.getSocketFactory
      .createSocket(sock, host, port, true)
      .asInstanceOf[SSLSocket]
    tls.setUseClientMode(true)
    tls.startHandshake()
    tls
  }

  /** Wrap an accepted plaintext socket in server-mode TLS (the PG and
    * MySQL mid-protocol upgrades; Mongo servers listen on an
    * SSLServerSocket instead). */
  def serverUpgrade(sock: Socket, ctx: SSLContext): SSLSocket = {
    val tls = ctx.getSocketFactory
      .createSocket(sock,
        sock.getInetAddress.getHostAddress, sock.getPort, true)
      .asInstanceOf[SSLSocket]
    tls.setUseClientMode(false)
    tls.startHandshake()
    tls
  }

  /** Server context from a PKCS#12 keystore (what `keytool
    * -genkeypair -storetype PKCS12` emits). */
  def serverContext(pkcs12Path: String, password: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(pkcs12Path)
    try ks.load(in, password.toCharArray)
    finally in.close()
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Verifying CLIENT context from a CA certificate bundle (PEM or
    * DER, one or more certs): chain verification against exactly those
    * roots, and — with `verifyHostname` — RFC 6125 matching of the
    * dialed host against the leaf's subjectAltNames (dNSName
    * case-insensitive with single leftmost-label wildcard, iPAddress
    * by equality; CN fallback only when the cert carries no SAN).
    * Hostname verification lives INSIDE the trust manager (the dialed
    * host arrives via the handshake session's peer host), so the same
    * `Option[SSLContext]` plumbing every wire client already has
    * carries verify-full with no new parameters. */
  def verifyingContext(caPath: String,
      verifyHostname: Boolean): SSLContext = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val in = new java.io.FileInputStream(caPath)
    val cas = try cf.generateCertificates(in) finally in.close()
    if (cas.isEmpty) throw new IllegalArgumentException(
      s"ssl_ca '$caPath' contains no certificates")
    val ks = KeyStore.getInstance(KeyStore.getDefaultType)
    ks.load(null, null)
    val it = cas.iterator()
    var i = 0
    while (it.hasNext) {
      ks.setCertificateEntry(s"ca$i", it.next()); i += 1
    }
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val base = tmf.getTrustManagers.collectFirst {
      case x: X509TrustManager => x
    }.getOrElse(throw new IllegalStateException("no X509TrustManager"))
    val tm = new javax.net.ssl.X509ExtendedTrustManager {
      private def hostCheck(host: String,
          chain: Array[X509Certificate]): Unit =
        if (verifyHostname) {
          if (host == null || host.isEmpty)
            throw new java.security.cert.CertificateException(
              "verify-full: no peer host available to verify")
          matchHostname(host, chain(0))
        }
      override def checkServerTrusted(chain: Array[X509Certificate],
          authType: String): Unit = {
        base.checkServerTrusted(chain, authType)
        if (verifyHostname)
          throw new java.security.cert.CertificateException(
            "verify-full requires a socket-aware handshake")
      }
      override def checkServerTrusted(chain: Array[X509Certificate],
          authType: String, socket: Socket): Unit = {
        base.checkServerTrusted(chain, authType)
        val host = socket match {
          case s: SSLSocket =>
            Option(s.getHandshakeSession).map(_.getPeerHost).orNull
          case _ => null
        }
        hostCheck(host, chain)
      }
      override def checkServerTrusted(chain: Array[X509Certificate],
          authType: String, engine: javax.net.ssl.SSLEngine): Unit = {
        base.checkServerTrusted(chain, authType)
        hostCheck(engine.getPeerHost, chain)
      }
      override def checkClientTrusted(chain: Array[X509Certificate],
          authType: String): Unit =
        base.checkClientTrusted(chain, authType)
      override def checkClientTrusted(chain: Array[X509Certificate],
          authType: String, socket: Socket): Unit =
        base.checkClientTrusted(chain, authType)
      override def checkClientTrusted(chain: Array[X509Certificate],
          authType: String, engine: javax.net.ssl.SSLEngine): Unit =
        base.checkClientTrusted(chain, authType)
      override def getAcceptedIssuers: Array[X509Certificate] =
        base.getAcceptedIssuers
    }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array[TrustManager](tm), null)
    ctx
  }

  /** RFC 6125 host matching against one leaf certificate. */
  private[cdc] def matchHostname(host: String,
      cert: X509Certificate): Unit = {
    val isIp = host.forall(c => c.isDigit || c == '.') ||
      host.contains(':')
    val sans = Option(cert.getSubjectAlternativeNames).map { c =>
      val b = Seq.newBuilder[(Int, String)]
      c.forEach(entry => b += ((entry.get(0).asInstanceOf[Integer]
        .intValue(), String.valueOf(entry.get(1)))))
      b.result()
    }.getOrElse(Nil)
    def dnsMatches(pattern: String): Boolean = {
      val p = pattern.toLowerCase
      val h = host.toLowerCase
      if (!p.startsWith("*.")) p == h
      else { // single leftmost wildcard label only
        val suffix = p.drop(1) // ".example.com"
        val dot = h.indexOf('.')
        dot > 0 && h.substring(dot) == suffix
      }
    }
    val ok =
      if (sans.nonEmpty) {
        if (isIp) sans.exists { case (t, v) => t == 7 && v == host }
        else sans.exists { case (t, v) => t == 2 && dnsMatches(v) }
      } else if (!isIp) {
        // CN fallback: legacy certs without any SAN
        val cn = "(?i)CN=([^,]+)".r.findFirstMatchIn(
          cert.getSubjectX500Principal.getName).map(_.group(1))
        cn.exists(dnsMatches)
      } else false
    if (!ok) throw new java.security.cert.CertificateException(
      s"verify-full: host '$host' does not match the server " +
        "certificate's names")
  }

  /** Endpoint-URL ssl parameter → context: absent/false/disable =
    * plaintext, true/require = encrypt-only, verify-ca = chain
    * verification against `ssl_ca`, verify-full = chain + hostname —
    * libpq's sslmode ladder, so DDL-created mirrors are not locked
    * into encrypt-only. */
  def fromParam(v: String, caFile: Option[String]): Option[SSLContext] =
    v.toLowerCase match {
      case "" | "false" | "disable" | "off" => None
      case "true" | "require" | "on" => Some(trustAllContext)
      case mode @ ("verify-ca" | "verify-full") =>
        val ca = caFile.filter(_.nonEmpty).getOrElse(
          throw new IllegalArgumentException(
            s"ssl=$mode requires ssl_ca=<certificate path>"))
        Some(verifyingContext(ca, verifyHostname = mode == "verify-full"))
      case other => throw new IllegalArgumentException(
        s"unsupported ssl mode '$other' " +
          "(disable|require|verify-ca|verify-full)")
    }

  def fromParam(v: String): Option[SSLContext] = fromParam(v, None)
}
