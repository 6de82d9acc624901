package graft.core

/** Immutable prefix → URI-prefix map with CURIE compress/expand/standardize.
  *
  * Re-expresses the reference's `curies.Converter` chain semantics
  * (reference: src/sssom/context.py:23-101, src/sssom/util.py:578-591,
  * 1820-1828) as a small pure-Scala structure that is cheap to broadcast
  * to executors and usable inside typed `map`/`flatMap` transforms.
  *
  * Priority on chaining: earlier maps win on both prefix and URI-prefix
  * conflicts (built-ins > document curie_map > defaults), matching
  * `curies.chain`.
  */
final case class PrefixMap(entries: Vector[(String, String)]) extends Serializable {

  /** prefix → uri, first-wins. */
  @transient lazy val byPrefix: Map[String, String] =
    entries.foldLeft(Map.empty[String, String]) { case (m, (p, u)) =>
      if (m.contains(p)) m else m.updated(p, u)
    }

  /** URI prefixes sorted longest-first for longest-prefix-wins compression. */
  @transient lazy val byUriLongestFirst: Vector[(String, String)] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    val dedup = entries.filter { case (_, u) => seen.add(u) }
    dedup.sortBy { case (_, u) => -u.length }
  }

  def contains(prefix: String): Boolean = byPrefix.contains(prefix)

  def prefixes: Set[String] = byPrefix.keySet

  /** CURIE → IRI; None if the prefix is unknown or the value is not a CURIE. */
  def expand(curie: String): Option[String] = {
    val i = curie.indexOf(':')
    if (i <= 0) None
    else byPrefix.get(curie.substring(0, i)).map(_ + curie.substring(i + 1))
  }

  /** IRI → CURIE by longest matching URI prefix; None if no prefix matches. */
  def compress(iri: String): Option[String] =
    byUriLongestFirst.collectFirst {
      case (p, u) if iri.startsWith(u) => p + ":" + iri.substring(u.length)
    }

  /** Reference `_standardize_curie_or_iri`: compress IRIs, standardize
    * CURIEs (via expand→compress round-trip so prefix synonyms normalize),
    * pass through anything unconvertible (reference: src/sssom/util.py:578-591).
    */
  def standardize(value: String): String =
    if (value == null || value.isEmpty) value
    else if (PrefixMap.looksLikeIri(value)) compress(value).getOrElse(value)
    else if (PrefixMap.looksLikeCurie(value))
      expand(value).flatMap(compress).getOrElse(value)
    else value

  /** Expand-or-passthrough, for triple emission. */
  def expandOrSelf(value: String): String = expand(value).getOrElse(value)

  /** Chain with a lower-priority map (reference: curies.chain). */
  def chain(lower: PrefixMap): PrefixMap = PrefixMap(entries ++ lower.entries)

  /** Subset to the given prefixes (reference `clean_prefix_map`,
    * src/sssom/util.py:268-290).
    */
  def subMap(used: Set[String]): PrefixMap =
    PrefixMap(entries.filter { case (p, _) => used.contains(p) })

  /** Rename prefixes and rewire their expansions (reference
    * `reconcile_prefix_and_data`, src/sssom/util.py:1575-1597).
    */
  def renamePrefixes(renames: Map[String, String]): PrefixMap =
    PrefixMap(entries.map { case (p, u) => (renames.getOrElse(p, p), u) })

  /** Replace the expansion of the given prefixes (reference
    * `curies.rewire` as used by `reconcile_prefix_and_data`,
    * src/sssom/util.py:1594); prefixes absent from this map are added.
    */
  def rewireExpansions(expansions: Map[String, String]): PrefixMap = {
    val rewired = entries.map { case (p, u) =>
      (p, expansions.getOrElse(p, u))
    }
    val added = expansions.view
      .filterKeys(p => !entries.exists(_._1 == p))
      .map { case (p, u) => (p, u) }.toVector
    PrefixMap(rewired ++ added)
  }
}

object PrefixMap {
  /** Reference CURIE pattern (src/sssom/util.py:1420-1429). */
  private val CuriePattern = "^[A-Za-z0-9_.]+:[A-Za-z0-9_].*$".r

  def looksLikeCurie(s: String): Boolean =
    s != null && CuriePattern.matches(s)

  def looksLikeIri(s: String): Boolean =
    s != null && (s.startsWith("http://") || s.startsWith("https://") ||
      s.startsWith("ftp://") || s.startsWith("urn:"))

  /** Built-in prefixes, highest priority; redefinition is rejected at parse
    * (reference: src/sssom/context.py:23, SSSOM_BUILT_IN_PREFIXES).
    */
  val builtIn: PrefixMap = PrefixMap(Vector(
    "sssom" -> "https://w3id.org/sssom/",
    "owl" -> "http://www.w3.org/2002/07/owl#",
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "skos" -> "http://www.w3.org/2004/02/skos/core#",
    "semapv" -> "https://w3id.org/semapv/vocab/"
  ))

  val builtInPrefixes: Set[String] = builtIn.prefixes

  def apply(m: Iterable[(String, String)]): PrefixMap = PrefixMap(m.toVector)

  def empty: PrefixMap = PrefixMap(Vector.empty)
}
