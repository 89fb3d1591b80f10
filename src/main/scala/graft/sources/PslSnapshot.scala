package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * A truncated snapshot of the Public Suffix List (publicsuffix.org — the
 * Mozilla-maintained registry of suffixes under which internet names are
 * registered), shipped as the lookup fixture [[graft.operators.Corpus
 * .registrableDomain]] keys on. Registrable-domain (eTLD+1) keys close the
 * curation gap host-level keys leave open: a link farm spreading over
 * `a.free-host.example` / `b.free-host.example` subdomains evades a
 * host-keyed quota but collapses to one eTLD+1 key.
 *
 * Rule grammar (the PSL's own, https://publicsuffix.org/list/):
 *   - `co.uk`     — a public suffix; registrable = one more label.
 *   - `*.ck`      — wildcard: EVERY `x.ck` is a public suffix.
 *   - `!www.ck`   — exception to a wildcard: `www.ck` is NOT a public
 *                   suffix (it is itself registrable).
 *   - implicit default rule `*`: an unlisted TLD's last label is its
 *     public suffix — so single-label ICANN TLDs need no entry here.
 *
 * STALENESS: this is a ~90-rule subset (multi-label ICANN suffixes, the
 * canonical wildcard/exception pair, and common private-section hosting
 * suffixes) of a list that upstream ships ~9,500 rules of and updates
 * weekly. It is a FIXTURE: correct semantics, representative coverage,
 * deterministic for the oracle gate. A production deployment swaps in the
 * full current list via [[fromFile]] (parses the official
 * public_suffix_list.dat format) — the operator's broadcast shape is sized
 * for the real 10⁴-row list (a few hundred KB on the wire, far under any
 * broadcast limit), and [[graft.operators.Corpus.registrableDomain]]'s
 * auto-dispatch takes the rule-count-independent hash-join path at that
 * size.
 */
object PslSnapshot {

  /** Raw rules, PSL spelling (exceptions `!`-prefixed, wildcards `*.`). */
  val rules: Seq[String] = Seq(
    // ---- ICANN section: multi-label country suffixes ----
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk", "plc.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "co.za", "org.za", "net.za", "web.za", "ac.za", "gov.za",
    "co.nz", "org.nz", "net.nz", "ac.nz", "govt.nz", "geek.nz",
    "com.ar", "org.ar", "net.ar", "edu.ar", "gob.ar",
    "com.tr", "org.tr", "net.tr", "edu.tr", "gov.tr",
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.my", "org.my", "net.my", "edu.my", "gov.my",
    "com.ph", "org.ph", "net.ph", "edu.ph", "gov.ph",
    // the canonical wildcard + exception pair (Cook Islands)
    "*.ck", "!www.ck",
    // ---- private section: hosting platforms where each subdomain is an
    // independent registrant (exactly the quota-evasion case) ----
    "blogspot.com", "github.io", "gitlab.io", "herokuapp.com",
    "netlify.app", "vercel.app", "web.app", "firebaseapp.com", "appspot.com",
    "azurewebsites.net", "cloudfront.net", "wordpress.com", "neocities.org",
    "s3.amazonaws.com", "compute.amazonaws.com", "pages.dev", "workers.dev")

  /** Plain public-suffix rules (no `!`/`*.` markers). */
  val normal: Seq[String] = rules.filterNot(r => r.startsWith("!") || r.startsWith("*."))
  /** Wildcard rule BASES: `*.ck` → `ck` (the wildcard consumes one more label). */
  val wildcardBases: Seq[String] = rules.filter(_.startsWith("*.")).map(_.drop(2))
  /** Exception rules, marker stripped: `!www.ck` → `www.ck`. */
  val exceptions: Seq[String] = rules.filter(_.startsWith("!")).map(_.drop(1))

  /** Longest rule, in labels, across every class (wildcards count their
    * consumed label) — the suffix-probe depth a matcher needs. */
  val maxRuleLabels: Int = (
    normal.map(_.count(_ == '.') + 1) ++
      wildcardBases.map(_.count(_ == '.') + 2) ++
      exceptions.map(_.count(_ == '.') + 1)).max

  /** The snapshot as the one-column `(rule)` lookup table the operator and
    * a production full-PSL swap both consume. */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rules.toDF("rule")
  }

  /**
   * Parse the OFFICIAL publicsuffix.org file format (the bytes a production
   * deployment downloads from https://publicsuffix.org/list/public_suffix_list.dat)
   * into the rule spelling [[graft.operators.Corpus.registrableDomain]]
   * consumes — the production swap path the STALENESS note promises,
   * implemented end to end: download the current list, [[fromFile]] it, and
   * the operator's auto-dispatch takes the hash-join path at that size
   * (the probe chain measured 70 s on 10k hosts at real-list rule counts;
   * the join path 0.4 s on 10× more — ScaleBench `psl` section).
   *
   * Format rules, per the list's own spec:
   *   - each line is only read up to the first whitespace;
   *   - a line that is empty (after that cut) or starts with `//` is a
   *     comment — this covers the `===BEGIN ICANN DOMAINS===` section
   *     markers, which live inside comments;
   *   - rules are case-insensitive; canonical form is lowercase.
   *
   * Both the ICANN and PRIVATE sections are kept: for crawl curation the
   * private section is the point (hosting platforms where each subdomain is
   * an independent registrant). Hosts must be spelled the way the list
   * spells them (the upstream list carries IDN labels in Unicode, not
   * punycode; this loader does no punycode conversion — normalize hosts on
   * the way in if your crawl frontier stores punycode).
   */
  def parseList(lines: IterableOnce[String]): Seq[String] =
    lines.iterator
      .map(l => l.takeWhile(!_.isWhitespace))
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.toLowerCase)
      .toSeq

  /** [[parseList]] over a file path (local or any Hadoop-visible filesystem
    * — the read goes through `spark.read.textFile`, so the list can sit on
    * the DFS next to the data), returning the `(rule)` table. The file is
    * small (~240 KB upstream) and rule order is irrelevant to the PSL
    * algorithm (longest-match + exception precedence), so the driver-side
    * collect and any cross-partition reordering are both harmless. */
  def fromFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    parseList(spark.read.textFile(path).collect()).toDF("rule")
  }
}
