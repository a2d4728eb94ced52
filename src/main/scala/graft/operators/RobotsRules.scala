package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) for the d131
  * gate — the crawl-politeness stage that decides which URLs may even
  * enter the corpus (the d76 URL-curation pairing): group structure
  * (one or more `User-agent` lines, then `Allow`/`Disallow` rules
  * until the next group), case-insensitive keys, comments and blank
  * lines, UNKNOWN keys ignored (Sitemap/Crawl-delay — the spec says
  * ignore, and real files are full of them), and the RFC's precedence
  * semantics implemented exactly:
  *
  *  - group selection: the group naming our product token wins over
  *    the `*` group; neither present → everything allowed;
  *  - rule matching: `*` matches any octet sequence, a TRAILING `$`
  *    anchors at the URL end (elsewhere `$` is literal); an EMPTY
  *    Disallow value is a no-op (the spec's allow-all idiom);
  *  - verdict: the LONGEST matching pattern wins; a length tie goes
  *    to Allow (§2.2.2). No match → allowed.
  *
  * The wildcard matcher is property-pinned against a regex reference
  * (escape + `*`→`.*` + trailing anchor) on random pattern/path
  * pairs. Strict grammar: a rule BEFORE any User-agent line, a line
  * with no colon, and an empty User-agent value all QUARANTINE the
  * file — a crawler that guesses at broken robots.txt violates the
  * protocol it exists to honor.
  */
object RobotsCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private[graft] final case class Group(agents: Seq[String],
                                        rules: Seq[(Boolean, String)])

  /** Strict parse → groups in file order. */
  private[graft] def parse(txt: String): Option[Seq[Group]] =
    try {
      val groups = Seq.newBuilder[Group]
      var agents = Seq.newBuilder[String]
      var rules = Seq.newBuilder[(Boolean, String)]
      var nAgents = 0
      var nRules = 0
      var anyGroup = false
      def flush(): Unit = {
        if (nAgents > 0) {
          groups += Group(agents.result(), rules.result())
          anyGroup = true
        }
        agents = Seq.newBuilder[String]
        rules = Seq.newBuilder[(Boolean, String)]
        nAgents = 0
        nRules = 0
      }
      txt.split("\n", -1).foreach { raw =>
        val noComment = {
          val h = raw.indexOf('#')
          if (h >= 0) raw.substring(0, h) else raw
        }
        val line = noComment.stripSuffix("\r").trim
        if (line.nonEmpty) {
          val c = line.indexOf(':')
          if (c <= 0) throw Malformed // no key:value shape
          val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              if (value.isEmpty) throw Malformed
              if (nRules > 0) flush() // a new group starts
              agents += value.toLowerCase(java.util.Locale.ROOT)
              nAgents += 1
            case "allow" | "disallow" =>
              if (nAgents == 0) throw Malformed // orphan rule
              if (value.nonEmpty) { // empty Disallow/Allow is a no-op
                rules += ((key == "allow", value))
              }
              nRules += 1
            case _ => () // Sitemap, Crawl-delay, …: ignored per spec
          }
        }
      }
      flush()
      Some(groups.result())
    } catch {
      case Malformed => None
    }

  /** RFC 9309 path match: `*` = any octets, trailing `$` anchors.
    * Iterative greedy with backtracking (no regex in the hot path). */
  private[graft] def pathMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // match p as a PREFIX pattern (robots rules match from the path
    // start; unanchored patterns may end anywhere)
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    var matchedEnd = -1
    def prefixDone: Boolean = pi == p.length
    while (si <= path.length) {
      if (prefixDone) {
        matchedEnd = si
        if (!anchored) return true // prefix satisfied anywhere
        if (si == path.length) return true
        // anchored: must consume the whole path — backtrack the last
        // '*' to swallow more, if any
        if (starPi < 0) return false
        starSi += 1
        si = starSi
        pi = starPi + 1
      } else if (pi < p.length && p(pi) == '*') {
        starPi = pi
        starSi = si
        pi += 1
      } else if (si < path.length && pi < p.length && p(pi) == path(si)) {
        pi += 1
        si += 1
      } else if (starPi >= 0) {
        starSi += 1
        si = starSi
        pi = starPi + 1
        if (si > path.length) return false
      } else return false
    }
    false
  }

  /** The effective group for `product`: exact product-token group
    * beats `*`; None = no applicable group (allow everything). */
  private[graft] def selectGroup(groups: Seq[Group],
                                 product: String): Option[Group] = {
    val tok = product.toLowerCase(java.util.Locale.ROOT)
    groups.find(_.agents.contains(tok))
      .orElse(groups.find(_.agents.contains("*")))
  }

  /** (allowed, winning pattern length — 0 when no rule matched).
    * Longest pattern wins; ties go to Allow. */
  private[graft] def verdict(group: Option[Group], path: String): (Boolean, Int) =
    group match {
      case None => (true, 0)
      case Some(g) =>
        var bestLen = -1
        var bestAllow = true
        g.rules.foreach { case (allow, pat) =>
          if (pathMatches(pat, path)) {
            if (pat.length > bestLen ||
                (pat.length == bestLen && allow && !bestAllow)) {
              bestLen = pat.length
              bestAllow = allow
            }
          }
        }
        if (bestLen < 0) (true, 0) else (bestAllow, bestLen)
    }
}

/** In-plan synthesizer + gate for d131: each doc carries a synthetic
  * robots.txt (closed-form rules incl. a DECOY group for another bot
  * that must be ignored — proving group selection, not just matching)
  * and an 8-path probe grid exercising every semantic corner: prefix
  * rules, the longer-Allow-beats-Disallow precedence, `$` anchors
  * hitting and missing, `*` wildcards hitting and missing, and the
  * no-trailing-slash near-miss. Damage slice on doc_id%7: 0 → an
  * ORPHAN rule before any User-agent; 3 → a line with no colon; 5 →
  * an empty User-agent value — all grammar violations a strict
  * protocol reader must reject. Damaged docs contribute nothing. */
object RobotsSim {

  private[graft] def robotsTxt(docId: Long): String = {
    val k = docId % 10
    val sb = new StringBuilder()
    sb.append("# graft corpus robots fixture\n")
    sb.append("Sitemap: https://corpus.example/sitemap.xml\n") // ignored key
    if (docId % 3 == 0) {
      // a specific group for our bot (beats *) …
      sb.append("User-Agent: GraftBot\n")
      sb.append(s"Disallow: /private$k/\n")
      sb.append(s"Allow: /private$k/pub\n")
      sb.append("Disallow: /tmp$\n")
      sb.append("Disallow: /dl/*.zip$\n")
      sb.append("Disallow:\n") // empty: the allow-all no-op
      // … and a * group with rules that MUST NOT apply to us
      sb.append("User-agent: *\n")
      sb.append("Disallow: /\n")
    } else {
      sb.append("User-agent: *\n")
      sb.append(s"Disallow: /private$k/\n")
      sb.append(s"Allow: /private$k/pub\n")
      sb.append("Disallow: /tmp$\n")
      sb.append("Disallow: /dl/*.zip$\n")
    }
    // a decoy group for another product token: ignored either way
    sb.append("User-agent: OtherBot\n")
    sb.append("Disallow: /\n")
    sb.toString
  }

  private[graft] def payloadFor(docId: Long): String = {
    val clean = robotsTxt(docId)
    (docId % 7) match {
      case 0 => "Disallow: /orphan/\n" + clean // rule before any group
      case 3 => clean + "malformed line without colon\n"
      case 5 => clean + "User-agent:\n" // empty product token
      case _ => clean
    }
  }

  private[graft] def paths(docId: Long): Seq[String] = {
    val k = docId % 10
    Seq(
      s"/private$k/doc", // disallowed by the prefix rule (len 10)
      s"/private$k/pub/x", // allowed: longer Allow beats Disallow
      "/tmp", // disallowed by the $ anchor (len 5)
      "/tmp/file", // allowed: the anchor does NOT match
      s"/public/doc$docId", // allowed: no rule matches
      s"/private$k", // allowed: no trailing slash — prefix near-miss
      s"/dl/a$k.zip", // disallowed by the wildcard rule (len 10)
      s"/dl/a$k.zipx") // allowed: $ anchor misses
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("path_id", IntegerType),
    StructField("path", StringType),
    StructField("allowed", BooleanType),
    StructField("rule_len", IntegerType)))

  /** One row per (doc, probe path): the GraftBot verdict under the
    * doc's robots.txt. Map-only; damaged docs contribute nothing. */
  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            RobotsCodec.parse(payloadFor(id)).toSeq.flatMap { groups =>
              val g = RobotsCodec.selectGroup(groups, "graftbot")
              paths(id).zipWithIndex.map { case (p, j) =>
                val (ok, len) = RobotsCodec.verdict(g, p)
                Row(id, j, p, java.lang.Boolean.valueOf(ok), len)
              }
            }
          }
        }
      }(enc)
  }
}
