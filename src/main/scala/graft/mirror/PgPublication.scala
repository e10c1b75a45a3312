package graft.mirror

/** Publication-coverage checks for live pgwire captures — ONE home
  * for the logic VALIDATE MIRROR and table addition both need (the
  * reference's CheckSourceTables publication branch,
  * flow/connectors/postgres/validate.go:84-123, and the
  * AddTablesToPublication membership check,
  * postgres_source.go:1070-1096).
  *
  * Matching is by EXACT published name, like the reference: with
  * `publish_via_partition_root=true` a partitioned ROOT is what
  * `pg_publication_tables` lists (and what pgoutput announces); with
  * the default, pgoutput emits LEAF relations and the mirror routes
  * leaves through `table_map` — either way, the relation names the
  * engine consumes must be exactly the published ones. */
private[mirror] object PgPublication {

  /** The publication's coverage of this mirror's SOURCE relations.
    * Returns Right(description) when covered (existence + FOR ALL
    * TABLES or full membership), Left(message) when not. */
  def coverage(cfg: MirrorConfig, url: String): Either[String, String] = {
    val ep = graft.cdc.CaptureEndpoint.parse(url)
    val pub = ep.param("publication", "")
    if (pub.isEmpty) return Right("no publication named on the URL")
    val lit = graft.cdc.PgWire.quoteLiteral(pub)
    val c = graft.server.PgClients.connect(ep, Nil)
    try {
      val all = c.query(
        s"SELECT puballtables FROM pg_publication WHERE pubname = $lit")
        .rows.headOption.flatMap(_.head)
      all match {
        case None =>
          Left(s"publication '$pub' does not exist")
        case Some(v) if v == "t" || v == "true" =>
          Right(s"publication '$pub' is FOR ALL TABLES")
        case Some(_) =>
          val present = c.query(
            "SELECT schemaname || '.' || tablename FROM " +
              s"pg_publication_tables WHERE pubname = $lit").rows
            .flatMap(_.headOption.flatten).toSet
          val sourceFor = SnapshotFlow.invertRoutes(cfg)
          val wanted = (cfg.destinationTable +:
            cfg.extraTables.keys.toSeq)
            .map(t => sourceFor.getOrElse(t, t)).distinct
          val missing = wanted.filterNot(present.contains)
          if (missing.isEmpty)
            Right(s"publication '$pub' covers all " +
              s"${wanted.size} table(s)")
          else Left(s"publication '$pub' lacks table(s) " +
            s"${missing.mkString(", ")} — their changes would " +
            "silently never stream")
      }
    } finally c.close()
  }

  /** Membership of ONE source relation (table addition's gate). */
  def requireTablePublished(cfg: MirrorConfig, url: String,
      destTable: String): Unit = {
    val ep = graft.cdc.CaptureEndpoint.parse(url)
    val pub = ep.param("publication", "")
    if (pub.isEmpty) return
    val lit = graft.cdc.PgWire.quoteLiteral(pub)
    val c = graft.server.PgClients.connect(ep, Nil)
    try {
      val all = c.query(
        s"SELECT puballtables FROM pg_publication WHERE pubname = $lit")
        .rows.headOption.flatMap(_.head)
      if (all.exists(v => v == "t" || v == "true")) return
      val present = c.query(
        "SELECT schemaname || '.' || tablename FROM " +
          s"pg_publication_tables WHERE pubname = $lit").rows
        .flatMap(_.headOption.flatten).toSet
      val src = cfg.tableRoutes.collectFirst {
        case (s, d) if d == destTable => s
      }.getOrElse(destTable)
      if (!present.contains(src))
        throw new IllegalArgumentException(
          s"table addition: source relation '$src' is not in " +
            s"publication '$pub' — ALTER PUBLICATION ADD TABLE it on " +
            "the source first (the stream would otherwise silently " +
            "never carry its changes)")
    } finally c.close()
  }
}
