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

  /** Endpoint-URL ssl parameter → context: absent/false/disable =
    * plaintext, true/require = encrypt-only. */
  def fromParam(v: String): Option[SSLContext] =
    v.toLowerCase match {
      case "" | "false" | "disable" | "off" => None
      case "true" | "require" | "on" => Some(trustAllContext)
      case other => throw new IllegalArgumentException(
        s"unsupported ssl mode '$other' (disable|require)")
    }
}
