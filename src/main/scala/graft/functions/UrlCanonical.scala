package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for web-corpus curation: the pre-dedup pass that
  * makes trivially-different spellings of the same resource compare
  * equal, so URL-level dedup (and per-domain rollups) collapse real
  * duplicates instead of string variants. The rules are the common
  * crawler-canonicalization core (scheme/host case, default ports,
  * fragments, tracking params, trailing slash, param order):
  *
  *  1. fragment (`#...`) dropped;
  *  2. scheme and host lowercased (path/query case PRESERVED — it is
  *     significant on most servers);
  *  3. default port stripped (`:80` for http, `:443` for https; other
  *     ports kept);
  *  4. path: one trailing '/' stripped when the path is longer than
  *     '/', and a bare '/' becomes empty — `http://x.com/` ==
  *     `http://x.com`;
  *  5. query: params split on '&'; empties and tracking params dropped
  *     (name `utm_*`, or one of fbclid/gclid/ref/mc_cid/mc_eid);
  *     survivors sorted (binary order — ASCII-safe) and rejoined; an
  *     empty survivor set drops the '?';
  *  6. no percent-decoding — `%2F` vs `/` is server-dependent, decoding
  *     would MERGE genuinely different resources.
  *
  * A string without "://" is returned unchanged (not a URL — garbage in,
  * garbage out beats nulling a pipeline column). One pass, scan-local,
  * codegen'd: at corpus scale this runs on billions of rows before the
  * URL-dedup groupBy.
  */
object UrlCanonicalKernel {

  private val TrackingNames =
    Set("fbclid", "gclid", "ref", "mc_cid", "mc_eid")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val name = if (eq < 0) param else param.substring(0, eq)
    name.startsWith("utm_") || TrackingNames.contains(name)
  }

  def canonicalize(u: UTF8String): UTF8String = {
    val full = u.toString
    val sep = full.indexOf("://")
    if (sep < 0) return u
    // 1. fragment off first — nothing after '#' participates. A '#'
    // BEFORE the "://" means the separator sits inside the fragment of
    // a non-URL ("a#b://c") — per the contract above, that string is
    // not a URL and returns UNCHANGED: truncating to the pre-'#'
    // prefix merged distinct garbage strings under one dedup key.
    val hash = full.indexOf('#')
    if (hash >= 0 && hash < sep) return u
    val s = if (hash < 0) full else full.substring(0, hash)
    if (s.length < sep + 3) return UTF8String.fromString(s)
    val scheme = s.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(sep + 3)
    var hostEnd = rest.length
    var i = 0
    while (i < hostEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') { hostEnd = i }
      i += 1
    }
    val hostPort = rest.substring(0, hostEnd).toLowerCase(java.util.Locale.ROOT)
    val colon = hostPort.lastIndexOf(':')
    val (host, port) =
      if (colon < 0) (hostPort, "")
      else (hostPort.substring(0, colon), hostPort.substring(colon + 1))
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
    val tail = rest.substring(hostEnd)
    val q = tail.indexOf('?')
    var path = if (q < 0) tail else tail.substring(0, q)
    if (path == "/") path = ""
    else if (path.length > 1 && path.endsWith("/"))
      path = path.substring(0, path.length - 1)
    val query = if (q < 0) "" else tail.substring(q + 1)
    val params = query.split("&", -1)
      .filter(p => p.nonEmpty && !isTracking(p))
    java.util.Arrays.sort(params.asInstanceOf[Array[AnyRef]])
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (params.nonEmpty) {
      sb.append('?')
      var j = 0
      while (j < params.length) {
        if (j > 0) sb.append('&')
        sb.append(params(j))
        j += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** CANONICAL_URL(string) → string (see [[UrlCanonicalKernel]]).
  * Null in → null out; non-URL strings pass through unchanged. */
case class CanonicalUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"canonical_url requires a STRING column, got " +
        child.dataType.catalogString)
  }

  override def nullSafeEval(a: Any): Any =
    UrlCanonicalKernel.canonicalize(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.UrlCanonicalKernel.canonicalize($a)")
  override protected def withNewChildInternal(c: Expression): CanonicalUrl =
    copy(child = c)
  override def prettyName: String = "canonical_url"
}
