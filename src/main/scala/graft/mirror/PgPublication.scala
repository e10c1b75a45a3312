package graft.mirror

/** Publication-coverage and pullability checks for live pgwire
  * captures — ONE home for the logic VALIDATE MIRROR and table
  * addition both need (the reference's CheckSourceTables publication
  * branch, flow/connectors/postgres/validate.go:84-123; the
  * AddTablesToPublication membership check,
  * postgres_source.go:1070-1096; and EnsurePullability's
  * replica-identity rule, postgres_source.go:695-710).
  *
  * Publication matching is by EXACT published name, like the
  * reference: with `publish_via_partition_root=true` a partitioned
  * ROOT is what `pg_publication_tables` lists (and what pgoutput
  * announces); with the default, pgoutput emits LEAF relations and the
  * mirror routes leaves through `table_map` — either way, the relation
  * names the engine consumes must be exactly the published ones. */
private[mirror] object PgPublication {

  /** The EFFECTIVE publication: the URL param or the stream's default
    * ([[MirrorRunner]] starts replication with 'graft_pub' when the
    * URL names none — validation must check what the stream will
    * actually use, not skip). */
  private def pubOf(ep: graft.cdc.CaptureEndpoint): String =
    ep.param("publication", "graft_pub")

  /** Every SOURCE relation this mirror consumes: all `table_map` keys
    * routed to a mirror table (fan-in keeps EVERY leaf — this must
    * not go through invertRoutes, which rejects fan-in because a
    * SNAPSHOT needs one relation; the stream legitimately merges
    * many leaves into one destination) plus unrouted mirror tables. */
  private[mirror] def sourceRelations(cfg: MirrorConfig): Seq[String] = {
    val dests = (cfg.destinationTable +:
      cfg.extraTables.keys.toSeq).distinct
    val destSet = dests.toSet
    val routed = cfg.tableRoutes.collect {
      case (s, d) if destSet(d) => s
    }.toSeq
    val routedDests = cfg.tableRoutes.values.toSet
    (routed ++ dests.filterNot(routedDests.contains)).distinct
  }

  /** A validation connection must not hang a VALIDATE statement for
    * the capture session's full 60 s read timeout (fixture/misbehaving
    * endpoints): bound it unless the URL sets its own. */
  private def connect(url: String): graft.server.PgClient = {
    val ep = graft.cdc.CaptureEndpoint.parse(url)
    graft.server.PgClients.connect(ep.copy(params = ep.params
      .updated("read_timeout_ms", ep.param("read_timeout_ms", "5000"))),
      Nil)
  }

  /** The publication's coverage of this mirror's SOURCE relations.
    * Right(description) when covered (existence + FOR ALL TABLES or
    * full membership), Left(message) when not. */
  def coverage(cfg: MirrorConfig, url: String): Either[String, String] = {
    val ep = graft.cdc.CaptureEndpoint.parse(url)
    val pub = pubOf(ep)
    val lit = graft.cdc.PgWire.quoteLiteral(pub)
    val c = connect(url)
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
          val present = publishedOids(c, lit)
          val wanted = sourceRelations(cfg)
          val missing = wanted.filterNot(w =>
            resolveOid(c, w).exists(present.contains))
          if (missing.isEmpty)
            Right(s"publication '$pub' covers all " +
              s"${wanted.size} table(s)")
          else Left(s"publication '$pub' lacks table(s) " +
            s"${missing.mkString(", ")} — their changes would " +
            "silently never stream")
      }
    } finally c.close()
  }

  /** Membership of the source relation(s) behind ONE destination
    * table (the table-addition gate; a fan-in destination checks
    * every routed leaf). */
  def requireTablePublished(cfg: MirrorConfig, url: String,
      destTable: String): Unit = {
    val ep = graft.cdc.CaptureEndpoint.parse(url)
    val pub = pubOf(ep)
    val lit = graft.cdc.PgWire.quoteLiteral(pub)
    val c = connect(url)
    try {
      val all = c.query(
        s"SELECT puballtables FROM pg_publication WHERE pubname = $lit")
        .rows.headOption.flatMap(_.head)
      if (all.exists(v => v == "t" || v == "true")) return
      val present = publishedOids(c, lit)
      val srcs = cfg.tableRoutes.collect {
        case (s, d) if d == destTable => s
      }.toSeq match {
        case Nil => Seq(destTable)
        case routed => routed
      }
      val missing = srcs.filterNot(s =>
        resolveOid(c, s).exists(present.contains))
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"table addition: source relation(s) " +
            s"${missing.mkString(", ")} not in publication '$pub' — " +
            "ALTER PUBLICATION ADD TABLE them on the source first " +
            "(the stream would otherwise silently never carry their " +
            "changes)")
    } finally c.close()
  }

  /** Published relations as OIDs. `pg_publication_tables` lists
    * schema-qualified name pairs; comparing oids (with the config's
    * names resolved through [[resolveOid]]) makes membership
    * independent of how the mirror spells a name — an unqualified
    * 'users' resolved via search_path must match 'public.users',
    * and pullability (which already resolves via to_regclass) and
    * coverage must agree on the same relation set. */
  private def publishedOids(c: graft.server.PgClient,
      pubLit: String): Set[String] =
    c.query("SELECT c.oid::text FROM pg_publication_tables p " +
      "JOIN pg_namespace n ON n.nspname = p.schemaname " +
      "JOIN pg_class c ON c.relnamespace = n.oid " +
      "AND c.relname = p.tablename " +
      s"WHERE p.pubname = $pubLit").rows
      .flatMap(_.headOption.flatten).toSet

  /** A config-spelled relation name → oid, via the same to_regclass
    * resolution pullability uses (search_path-aware, quoting-aware).
    * None when the relation does not exist — callers report that as
    * not-covered, matching the reference's behavior. */
  private def resolveOid(c: graft.server.PgClient,
      name: String): Option[String] =
    c.query("SELECT to_regclass(" +
      graft.cdc.PgWire.quoteLiteral(name) + ")::oid::text").rows
      .headOption.flatMap(_.head)

  /** EnsurePullability (postgres_source.go:695-710): every source
    * relation needs a primary key, REPLICA IDENTITY FULL, or REPLICA
    * IDENTITY USING INDEX (the index columns are the key image — the
    * reference accepts those too). Missing relations report as
    * missing, not as a replica-identity problem. */
  def pullability(cfg: MirrorConfig, url: String)
      : Either[String, String] = {
    val wanted = sourceRelations(cfg)
    val c = connect(url)
    try {
      val probed = wanted.map { t =>
        val lit = graft.cdc.PgWire.quoteLiteral(t)
        t -> c.query(
          "SELECT c.relreplident::text, EXISTS(SELECT 1 FROM " +
            "pg_index i WHERE i.indrelid = c.oid AND i.indisprimary)" +
            s" FROM pg_class c WHERE c.oid = to_regclass($lit)").rows
          .headOption.map { row =>
            (row(0).getOrElse("d"),
              row(1).exists(v => v == "t" || v == "true"))
          }
      }
      val absent = probed.collect { case (t, None) => t }
      if (absent.nonEmpty)
        return Left(s"relation(s) ${absent.mkString(", ")} do not " +
          "exist on the source")
      val bad = probed.collect {
        case (t, Some((replident, hasPk)))
            if !hasPk && replident != "f" && replident != "i" => t
      }
      if (bad.nonEmpty)
        Left(s"table(s) ${bad.mkString(", ")} have no primary key " +
          "and no REPLICA IDENTITY FULL/USING INDEX — " +
          "updates/deletes cannot replicate by key")
      else Right(s"all ${wanted.size} table(s) pullable " +
        "(primary key or replica identity)")
    } finally c.close()
  }
}
