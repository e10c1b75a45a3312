package graft.server

import graft.cdc.CaptureEndpoint

/** One place that turns a `pg://`/`pgwire://` endpoint URL into a
  * connected [[PgClient]], honoring the SAME transport params the
  * capture pump honors (`MirrorRunner.ingestSocket`): `ssl=require|
  * verify-ca|verify-full` (+ `ssl_ca`), `ssh=user:pass@host[:port]`
  * (+ `ssh_key`, `ssh_host_key`), and the connect/read timeouts. Every
  * live query-session consumer (warehouse destination, snapshot
  * reads, live QRep pulls) builds through here so a tunneled or
  * TLS-required peer works identically across all of them — the
  * reference attaches one SSHConfig/TLS posture per peer and every
  * connector inherits it (flow/connectors/utils/ssh.go). */
object PgClients {

  def connect(url: String,
      extraStartup: Seq[(String, String)] = Nil): PgClient =
    connect(CaptureEndpoint.parse(url), extraStartup)

  def connect(ep: CaptureEndpoint,
      extraStartup: Seq[(String, String)]): PgClient = {
    val connectMs = ep.param("connect_timeout_ms", "10000").toInt
    val readMs = ep.param("read_timeout_ms", "60000").toInt
    val ssl = graft.cdc.Tls.fromParam(ep.param("ssl", ""),
      Some(ep.param("ssl_ca", "")))
    val dial: graft.cdc.Ssh.Dial = ep.params.get("ssh") match {
      case Some(spec) => graft.cdc.Ssh.tunnelDial(spec, readMs,
        keyFile = ep.params.get("ssh_key"),
        hostKeyPin = ep.params.get("ssh_host_key"))
      case None => graft.cdc.Ssh.tcpDial
    }
    new PgClient(ep.host, ep.port,
      user = if (ep.user.isEmpty) "postgres" else ep.user,
      database = if (ep.database.isEmpty) "postgres" else ep.database,
      password = ep.password,
      ssl = ssl,
      connectTimeoutMs = connectMs, readTimeoutMs = readMs,
      dial = dial,
      // Session TimeZone is pinned to UTC on EVERY live connection:
      // watermark arithmetic mixes `extract(epoch from ts)` (which
      // reads a `timestamp without time zone` as session-local) with
      // `to_timestamp(µs)` bounds (timestamptz, rendered through the
      // session zone) — on a non-UTC server the round window would
      // shift by the offset and rows near the boundary would be
      // PERMANENTLY skipped (the advanced watermark never revisits
      // them). With the session at UTC both sides agree exactly.
      // `application_name=<name>` on the endpoint URL names the
      // session in pg_stat_activity (the query-session half of
      // PEERDB_APPLICATION_NAME_PER_MIRROR_NAME; the replication
      // session gets its name from the setting directly)
      startupParams = ("TimeZone" -> "UTC") +:
        (ep.params.get("application_name")
          .map("application_name" -> _).toSeq ++ extraStartup)).connect()
  }
}
