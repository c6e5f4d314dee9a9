package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass text kernels.
  *
  * The composed forms — `filter(split(text, " "), t => t =!= "")` for
  * tokens, `size(filter(toks, isInCollection(set)))` for stopword/marker
  * counts, `array_distinct(transform(sequence(...), array_join(slice)))`
  * for shingles — are built on higher-order functions, which are
  * CodegenFallback: every evaluation re-splits the text interpreted, and
  * the dedup/pipeline/text suites evaluate several of them per row. Each
  * kernel here is ONE generated static call scanning the UTF-8 bytes once.
  *
  * Oracle equivalence (hash-gate critical): a token is a maximal run of
  * non-space bytes (0x20 never occurs inside a UTF-8 multibyte sequence),
  * exactly `list_filter(string_split(text, ' '), t -> t <> '')`; shingles
  * are space-joined k-gram runs deduped in first-occurrence order,
  * exactly the old transform+array_distinct composition.
  */
object TextKernels {

  private val SPACE = UTF8String.fromString(" ")

  // MessageDigest.getInstance is a synchronized JCA provider lookup —
  // per-row calls in the simhash/winnow kernels would put it on the
  // hottest map-side path; digest(input) resets the instance after use
  private val MD5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Maximal non-space byte runs, in order, empties dropped. */
  def tokenize(s: UTF8String): Array[UTF8String] = {
    val b = s.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = b.length
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val start = i
      while (i < n && b(i) != ' ') i += 1
      if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
    }
    out.toArray(new Array[UTF8String](out.size))
  }

  def tokens(s: UTF8String): ArrayData =
    new GenericArrayData(tokenize(s).asInstanceOf[Array[Any]])

  /** Unicode normalization (NFC; NFKC when `compat`). ASCII never needs
    * normalizing under either form, so a pure-ASCII byte scan returns
    * the input untouched — no String materialization on the common
    * path; non-ASCII input takes `isNormalized` (a cheap quick-check
    * pass for most text) before paying for `normalize`.
    */
  def unicodeNorm(s: UTF8String, compat: Boolean): UTF8String = {
    val b = s.getBytes
    var i = 0
    while (i < b.length && (b(i) & 0x80) == 0) i += 1
    if (i == b.length) return s
    val form =
      if (compat) java.text.Normalizer.Form.NFKC
      else java.text.Normalizer.Form.NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  def matchCount(s: UTF8String,
      set: java.util.HashSet[UTF8String]): Int = {
    val toks = tokenize(s)
    var c = 0
    var i = 0
    while (i < toks.length) {
      if (set.contains(toks(i))) c += 1
      i += 1
    }
    c
  }

  def shingles(s: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(s)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= toks.length - k) {
      seen.add(UTF8String.concatWs(SPACE,
        java.util.Arrays.copyOfRange(toks, i, i + k): _*))
      i += 1
    }
    new GenericArrayData(
      seen.toArray(new Array[AnyRef](seen.size)).asInstanceOf[Array[Any]])
  }

  /** Occurrence count of the most frequent k-gram (0 when < k tokens) —
    * per-document repetition signal, one local pass, no shuffle.
    */
  def maxShingleCount(s: UTF8String, k: Int): Int = {
    val toks = tokenize(s)
    if (toks.length < k) return 0
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var max = 0
    var i = 0
    while (i <= toks.length - k) {
      val g = UTF8String.concatWs(SPACE,
        java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      val c = counts.getOrDefault(g, 0) + 1
      counts.put(g, c)
      if (c > max) max = c
      i += 1
    }
    max
  }

  /** Weighted SimHash over the token multiset; see [[Simhash]]. */
  def simhash(s: UTF8String, bits: Int): Long = {
    val toks = tokenize(s)
    val tf = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < toks.length) {
      tf.put(toks(i), tf.getOrDefault(toks(i), 0) + 1)
      i += 1
    }
    val votes = new Array[Long](bits)
    val md = MD5.get()
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = md5Prefix60(md, e.getKey)
      val w = e.getValue.longValue()
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += w else votes(b) -= w
        b += 1
      }
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  /** 60-bit md5-prefix hash of a UTF8String (the cross-engine token
    * hash: `('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB).
    */
  private def md5Prefix60(md: java.security.MessageDigest,
      s: UTF8String): Long = {
    val d = md.digest(s.getBytes)
    var first8 = 0L
    var j = 0
    while (j < 8) { first8 = (first8 << 8) | (d(j) & 0xffL); j += 1 }
    first8 >>> 4
  }

  /** Winnowed fingerprints: min k-gram hash of every full `w`-gram
    * window (rolling monotonic-deque min, O(grams)), deduped and sorted.
    * A doc with fewer than `w` grams is one short window: it emits the
    * global min (every non-empty doc gets ≥1 fingerprint — the paper's
    * short-document rule). See [[Winnow]].
    */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = tokenize(s)
    val nGrams = toks.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val md = MD5.get()
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = md5Prefix60(md, UTF8String.concatWs(SPACE,
        java.util.Arrays.copyOfRange(toks, i, i + k): _*))
      i += 1
    }
    if (nGrams < w)
      return new GenericArrayData(Array[Any](hashes.min))
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]() // indices, increasing hash
    i = 0
    while (i < nGrams) {
      while (!deque.isEmpty && hashes(deque.peekLast) >= hashes(i))
        deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst <= i - w) deque.pollFirst()
      if (i >= w - 1) out.add(hashes(deque.peekFirst))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  /** PII patterns — shared verbatim with the DuckDB mirror (see
    * [[graft.text.TextOps]] text_pii_scrub). Constructs restricted to
    * what java.util.regex and RE2 execute identically: ASCII classes,
    * greedy bounded quantifiers, optional single-char separators, and
    * ASCII `\b` — no backreferences or lookaround (RE2 lacks them), no
    * constructs where leftmost-first semantics could diverge.
    */
  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IP_RE = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PHONE_RE =
    "\\+?(?:[0-9]{1,2}[-. ]?)?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}"

  private val EMAIL_P = java.util.regex.Pattern.compile(EMAIL_RE)
  private val IP_P = java.util.regex.Pattern.compile(IP_RE)
  private val PHONE_P = java.util.regex.Pattern.compile(PHONE_RE)

  /** Replace every match of `p` with `tag`, returning the new text and
    * the match count in one scan (no replaceAll re-scan).
    */
  private def scrubOne(t: String, p: java.util.regex.Pattern,
      tag: String): (String, Long) = {
    val m = p.matcher(t)
    var n = 0L
    val sb = new java.lang.StringBuilder()
    while (m.find()) { n += 1; m.appendReplacement(sb, tag) }
    if (n == 0) (t, 0L)
    else { m.appendTail(sb); (sb.toString, n) }
  }

  /** Email → IP → phone redaction with per-stage counts; see [[PiiScrub]].
    * Stage ORDER is part of the contract: IPs are counted on the
    * email-scrubbed text and phones on the email+IP-scrubbed text, so a
    * dotted-digit run can never be double-counted as both IP and phone
    * (the mirror stages its regexp_replace/extract_all identically).
    */
  def piiScrub(s: UTF8String): InternalRow = {
    val (t1, emails) = scrubOne(s.toString, EMAIL_P, "<EMAIL>")
    val (t2, ips) = scrubOne(t1, IP_P, "<IP>")
    val (t3, phones) = scrubOne(t2, PHONE_P, "<PHONE>")
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(t3), emails, ips, phones))
  }

  /** URL canonicalization — the normalize half of dedup_url; every step
    * is mirrored 1:1 by DuckDB string functions in the oracle (see
    * [[graft.dedup.Dedup]] dedup_url):
    *  1. strip the fragment (first `#` to end);
    *  2. no `://` → return as-is (opaque identifier, no structure to
    *     normalize);
    *  3. lowercase the scheme and the authority (up to the first `/`
    *     or `?`);
    *  4. drop a leading `www.`; drop the scheme's default port
    *     (`:80` for http, `:443` for https — other scheme/port combos
    *     are meaningful and kept);
    *  5. strip trailing `/` runs from the path (`/a/` ≡ `/a`, bare
    *     `/` ≡ empty);
    *  6. sort query params byte-lexicographically (`?b=2&a=1` ≡
    *     `?a=1&b=2` — binary sort in both engines), dropping an empty
    *     query entirely.
    */
  def canonicalUrl(s: UTF8String): UTF8String = {
    var u = s.toString
    val h = u.indexOf('#')
    if (h >= 0) u = u.substring(0, h)
    val sep = u.indexOf("://")
    if (sep < 0) return UTF8String.fromString(u)
    val scheme = u.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = u.substring(sep + 3)
    var cut = rest.length
    val sl = rest.indexOf('/')
    if (sl >= 0) cut = sl
    val qm = rest.indexOf('?')
    if (qm >= 0 && qm < cut) cut = qm
    var auth = rest.substring(0, cut).toLowerCase(java.util.Locale.ROOT)
    if (auth.startsWith("www.")) auth = auth.substring(4)
    if (scheme == "http" && auth.endsWith(":80")) auth = auth.dropRight(3)
    else if (scheme == "https" && auth.endsWith(":443"))
      auth = auth.dropRight(4)
    val tail = rest.substring(cut)
    val qi = tail.indexOf('?')
    var path = if (qi >= 0) tail.substring(0, qi) else tail
    val query = if (qi >= 0) tail.substring(qi + 1) else ""
    while (path.endsWith("/")) path = path.dropRight(1)
    val cq =
      if (query.isEmpty) ""
      else "?" + query.split("&", -1).sorted.mkString("&")
    UTF8String.fromString(scheme + "://" + auth + path + cq)
  }

  /** All k-grams in order, duplicates KEPT (term-frequency consumers). */
  def shinglesAll(s: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(s)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - k + 1)
    var i = 0
    while (i <= toks.length - k) {
      out(i) = UTF8String.concatWs(SPACE,
        java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `simhash(text)` → long: weighted `bits`-bit SimHash in one map-side
  * pass — tokenize, term-frequency weights, per-token 60-bit md5-prefix
  * hash, signed bit votes. Bit-identical to the previous composed form
  * (explode → groupBy(doc,tok) → `bits` vote aggregates → groupBy(doc),
  * TWO exchanges) and to the DuckDB mirror: the token hash is the first
  * 15 md5 hex chars as a long — numerically the top 60 bits of the
  * digest's first 8 bytes — and votes are exact integer sums, so the
  * value survives any evaluation order.
  */
case class Simhash(child: Expression, bits: Int)
    extends UnaryExpression with TextKernelExpression {
  require(bits >= 1 && bits <= 60, s"bits must be in [1,60], got $bits")
  override def prettyName: String = "simhash"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash(input.asInstanceOf[UTF8String], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.simhash($a, $bits);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** `winnow(text)` → array<long>: winnowed document fingerprints
  * (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
  * Document Fingerprinting", SIGMOD 2003): hash every k-gram (60-bit
  * md5 prefix — the cross-engine token hash), slide a w-window over the
  * hash sequence keeping each window's minimum via a rolling
  * monotonic-deque (O(1) amortized per gram), dedup + sort. Winnowing
  * guarantees any shared substring of ≥ w+k-1 tokens contributes a
  * shared fingerprint, with ~2/(w+1) density — the rolling-hash
  * fingerprint family, distinct from the whole-document md5 of
  * `text_fingerprint`.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with TextKernelExpression {
  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
  override def prettyName: String = "winnow"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnow(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.winnow($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Shared scaffolding: string input, null-intolerant, one static call. */
sealed trait TextKernelExpression { self: UnaryExpression =>
  final override def nullIntolerant: Boolean = true
  final override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string column, got ${other.simpleString}")
    }
}

/** `tokens(text)` → array<string>: whitespace tokens, empties dropped. */
case class Tokens(child: Expression)
    extends UnaryExpression with TextKernelExpression {
  override def prettyName: String = "tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokens(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.tokens($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** `token_match_count(text)` → int: tokens contained in a fixed set. */
case class TokenMatchCount(child: Expression, words: Seq[String])
    extends UnaryExpression with TextKernelExpression {
  override def prettyName: String = "token_match_count"
  override def dataType: DataType = IntegerType

  private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.matchCount(input.asInstanceOf[UTF8String], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
      s"${ev.value} = graft.functions.TextKernels.matchCount($a, $ref);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** `max_shingle_count(text)` → int: occurrences of the most frequent
  * k-gram — the Gopher-style repetition signal, computed per document
  * with zero shuffle.
  */
case class MaxShingleCount(child: Expression, k: Int)
    extends UnaryExpression with TextKernelExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")
  override def prettyName: String = "max_shingle_count"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    TextKernels.maxShingleCount(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.maxShingleCount($a, $k);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** `canonical_url(url)` → string: URL canonicalization (see
  * [[TextKernels.canonicalUrl]] for the step contract) in one codegen'd
  * call — the map-only normalize stage of dedup_url.
  */
case class CanonicalUrl(child: Expression)
    extends UnaryExpression with TextKernelExpression {
  override def prettyName: String = "canonical_url"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernels.canonicalUrl(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.canonicalUrl($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** `pii_scrub(text)` → struct<scrubbed:string, n_emails:long,
  * n_ips:long, n_phones:long>: email/phone/IP redaction with per-doc
  * counts — the mandatory pre-release scrubbing stage (Dolma /
  * RefinedWeb run it before anything else touches text) — in ONE
  * codegen'd call per row. The alternative (chained builtin
  * regexp_replace + three regexp_count consumers) re-scans the text
  * per consumer after CollapseProject inlining; here each pattern
  * scans once, counting while replacing. Patterns and stage order are
  * shared with the DuckDB mirror (see [[TextKernels.EMAIL_RE]]) and
  * restricted to the regex subset java.util.regex and RE2 execute
  * identically, so the scrubbed TEXT itself hash-gates, not just the
  * counts.
  */
case class PiiScrub(child: Expression)
    extends UnaryExpression with TextKernelExpression {
  override def prettyName: String = "pii_scrub"
  override def dataType: DataType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TextKernels.piiScrub(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.piiScrub($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** `nfc_normalize(text)` / `nfkc_normalize(text)` → string: Unicode
  * normalization (canonical NFC, or compatibility NFKC when
  * `compat = true`) in one codegen'd call — the ftfy/CCNet cleanup step
  * every crawled corpus runs BEFORE tokenize/fingerprint, so that
  * visually-identical spellings ("é" vs "e"+U+0301; NFKC also folds
  * ligatures/fullwidth forms) share one byte sequence and one hash.
  * Pure-ASCII rows (the overwhelming majority of a deduplicated English
  * corpus) short-circuit on a byte scan without the String round-trip;
  * already-normalized non-ASCII rows return the input buffer unchanged.
  * NFC output matches DuckDB's `nfc_normalize` (both implement UAX #15;
  * composition of the stable Latin range is version-independent), which
  * is what lets the text_normalize query hash-gate the normalized TEXT
  * itself, not a proxy count.
  */
case class UnicodeNormalize(child: Expression, compat: Boolean = false)
    extends UnaryExpression with TextKernelExpression {
  override def prettyName: String =
    if (compat) "nfkc_normalize" else "nfc_normalize"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernels.unicodeNorm(input.asInstanceOf[UTF8String], compat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.unicodeNorm($a, $compat);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** `word_shingles(text)` → array<string>: space-joined k-grams straight
  * from the text — no intermediate token array in the plan. `distinct`
  * keeps first-occurrence-order uniques (set-similarity consumers) or
  * every gram in order (term-frequency consumers).
  */
case class WordShingles(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression with TextKernelExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    if (distinct) TextKernels.shingles(input.asInstanceOf[UTF8String], k)
    else TextKernels.shinglesAll(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = if (distinct) "shingles" else "shinglesAll"
      s"${ev.value} = graft.functions.TextKernels.$m($a, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
