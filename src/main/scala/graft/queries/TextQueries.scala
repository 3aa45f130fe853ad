package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps

/** Text-analysis + deduplication queries over the `documents` table —
  * the training-data-pipeline operator set (language-ID, quality scoring,
  * token counting, fingerprinting; exact / MinHash-LSH / SimHash / n-gram
  * Jaccard dedup), each with a DuckDB oracle. */
object TextQueries {

  import Tables.t

  private val docsSql = "SELECT doc_id, text, lang, source, n_chars FROM documents"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.distinctTokenCount(col("text")).as("n_distinct_tokens"))
        .orderBy("doc_id")
    }),

    "t_quality" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), TextOps.qualityStruct(col("text")).as("q"))
        .select(col("doc_id"), col("q.n_chars").as("n_chars"), col("q.n_tokens").as("n_tokens"),
          col("q.n_distinct").as("n_distinct"), col("q.chars_per_token").as("chars_per_token"),
          col("q.stopword_ratio").as("stopword_ratio"))
        .orderBy("doc_id")
    }),

    "t_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), TextOps.langId(col("text")).as("langid"))
        .orderBy("doc_id")
    }),

    "t_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          TextOps.fingerprint(col("text")).as("fingerprint"),
          TextOps.shingleFingerprint(col("text"), 3).as("min_shingle_fp"))
        .orderBy("doc_id")
    }),

    "d_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id").cast("long").as("doc_id"), col("canonical").cast("long").as("canonical"),
          col("group_size").cast("long").as("group_size"))
        .orderBy("doc_id")
    }),

    // The 128-bit xxhash64-pair production path. Unlike the other _fast
    // variants its OUTPUT is hash-independent (keys + group sizes), so it
    // carries the same full value oracle as d_exact — DuckDB groups by
    // text equality and must agree exactly.
    "d_exact_fast" -> ((s, dir) => {
      Dedup.exactXx(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id").cast("long").as("doc_id"), col("canonical").cast("long").as("canonical"),
          col("group_size").cast("long").as("group_size"))
        .orderBy("doc_id")
    }),

    "d_minhash_sig" -> ((s, dir) => {
      Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id", "text", numHashes = 4)
        .select(col("key").cast("long").as("doc_id"), col("mh0"), col("mh1"), col("mh2"), col("mh3"))
        .orderBy("doc_id")
    }),

    "d_minhash_lsh" -> ((s, dir) => {
      Dedup.lshCandidates(t(s, dir, "documents"), "doc_id", "text", numHashes = 4, rowsPerBand = 2)
        .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"),
          col("n_shared_bands").cast("long").as("n_shared_bands"))
        .orderBy("a", "b")
    }),

    // the band buckets the default cap WOULD drop at a small cap — the
    // audit surface of the no-silent-caps rule, driver-gated end-to-end
    // (cap 40 is chosen to make the dropped set non-empty on this table:
    // near-empty documents collapse to shared signatures)
    "d_lsh_oversized" -> ((s, dir) => {
      Dedup.oversizedLshBuckets(t(s, dir, "documents"), "doc_id", "text",
          numHashes = 4, rowsPerBand = 2, maxBucketSize = 40L)
        .select(col("band").cast("long").as("band"), col("bh"),
          col("bn").cast("long").as("bn"))
        .orderBy("band", "bh")
    }),

    // production hash path (xxhash64 longs instead of md5 hex strings):
    // same pipeline shape, no SQL oracle (xxhash64 is not portable to
    // DuckDB) -> driver records the weaker rows-only check; the md5 twin
    // above is the hash-portability-gated version of the same operator
    "d_minhash_lsh_fast" -> ((s, dir) => {
      Dedup.lshCandidates(t(s, dir, "documents"), "doc_id", "text",
          numHashes = 4, rowsPerBand = 2, hashing = graft.dedup.XxHashing)
        .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"),
          col("n_shared_bands").cast("long").as("n_shared_bands"))
        .orderBy("a", "b")
    }),

    "d_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text", k = 3, maxShingleDf = 100L)
        .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(desc("jaccard"), asc("a"), asc("b"))
        .limit(50)
    }),

    // production hash path for the inverted index (64-bit shingle keys
    // instead of raw shingle strings); rows-only driver check, md5 twin
    // above carries the value-level oracle
    "d_ngram_jaccard_fast" -> ((s, dir) => {
      Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text", k = 3,
          maxShingleDf = 100L, hashing = graft.dedup.XxHashing)
        .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(desc("jaccard"), asc("a"), asc("b"))
        .limit(50)
    }),

    "d_simhash" -> ((s, dir) => {
      Dedup.simHash(t(s, dir, "documents"), "doc_id", "text", bits = 16)
        .select(col("key").cast("long").as("doc_id"), col("simhash").cast("long").as("simhash"))
        .orderBy("doc_id")
    }),

    // production fingerprint (64-bit, xxhash64 votes, shuffle-free native
    // expression); rows-only driver check — the md5 twin above carries the
    // value-level oracle, and the native md5 path is itself oracle-gated
    // through d_simhash
    "d_simhash_fast" -> ((s, dir) => {
      Dedup.simHash(t(s, dir, "documents"), "doc_id", "text", bits = 64,
          hashing = graft.dedup.XxHashing)
        .select(col("key").cast("long").as("doc_id"), col("simhash").cast("long").as("simhash"))
        .orderBy("doc_id")
    })
  )

  // DuckDB token list for a text column, empties dropped.
  private def toksSql(src: String) =
    s"""SELECT doc_id, tok FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM ($src)
       |) WHERE tok <> ''""".stripMargin

  private val enStopList = TextOps.EnStop.map(w => s"'$w'").mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "t_tokens" ->
      s"""WITH toks AS (${toksSql(docsSql)})
         |SELECT d.doc_id::BIGINT AS doc_id,
         |  (SELECT count(*) FROM toks t WHERE t.doc_id = d.doc_id)::BIGINT AS n_tokens,
         |  (SELECT count(DISTINCT tok) FROM toks t WHERE t.doc_id = d.doc_id)::BIGINT AS n_distinct_tokens
         |FROM documents d ORDER BY doc_id""".stripMargin,

    "t_quality" ->
      s"""WITH toks AS (${toksSql(docsSql)}),
         | stats AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
         |             sum(CASE WHEN tok IN ($enStopList) THEN 1 ELSE 0 END) AS stop_hits
         |           FROM toks GROUP BY doc_id)
         |SELECT d.doc_id::BIGINT AS doc_id,
         |  length(d.text)::BIGINT AS n_chars,
         |  coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
         |  coalesce(s.n_distinct, 0)::BIGINT AS n_distinct,
         |  round(CASE WHEN coalesce(s.n_tokens,0) > 0 THEN length(d.text)::DOUBLE / s.n_tokens ELSE 0 END, 6) AS chars_per_token,
         |  round(CASE WHEN coalesce(s.n_tokens,0) > 0 THEN s.stop_hits::DOUBLE / s.n_tokens ELSE 0 END, 6) AS stopword_ratio
         |FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id ORDER BY doc_id""".stripMargin,

    "t_langid" -> {
      val scoreCols = TextOps.LangMarkers.map { case (code, words) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        s"sum(CASE WHEN tok IN ($list) THEN 1 ELSE 0 END) AS s_$code"
      }.mkString(",\n             ")
      val codes = TextOps.LangMarkers.map(_._1)
      val mx = s"greatest(${codes.map(c => s"s_$c").mkString(", ")})"
      val pick = codes.map(c => s"WHEN s_$c = $mx THEN '$c'").mkString(" ")
      s"""WITH toks AS (${toksSql(docsSql)}),
         | scores AS (SELECT doc_id,
         |             $scoreCols
         |           FROM toks GROUP BY doc_id)
         |SELECT d.doc_id::BIGINT AS doc_id,
         |  coalesce((SELECT CASE WHEN $mx = 0 THEN 'und' $pick END
         |            FROM scores s WHERE s.doc_id = d.doc_id), 'und') AS langid
         |FROM documents d ORDER BY doc_id""".stripMargin
    },

    "t_fingerprint" ->
      s"""WITH toks AS (
         |  SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx,
         |         count(*) OVER (PARTITION BY doc_id) AS n
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         |               generate_subscripts(string_split(text, ' '), 1) AS pos
         |        FROM documents WHERE text <> '')
         |  WHERE tok <> ''
         |), sh AS (
         |  SELECT a.doc_id, min(md5(a.tok || ' ' || b.tok || ' ' || c.tok)) AS min_shingle_fp
         |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
         |              JOIN toks c ON c.doc_id = a.doc_id AND c.idx = a.idx + 2
         |  GROUP BY a.doc_id)
         |SELECT d.doc_id::BIGINT AS doc_id, md5(d.text) AS fingerprint, s.min_shingle_fp
         |FROM documents d LEFT JOIN sh s ON s.doc_id = d.doc_id ORDER BY doc_id""".stripMargin,

    "d_exact" ->
      """WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
        | rep AS (SELECT content_hash, min(doc_id) AS canonical, count(*) AS group_size
        |         FROM h GROUP BY content_hash)
        |SELECT h.doc_id::BIGINT AS doc_id, rep.canonical::BIGINT AS canonical,
        |       rep.group_size::BIGINT AS group_size
        |FROM h JOIN rep ON h.content_hash = rep.content_hash ORDER BY doc_id""".stripMargin,

    // oracle groups by the TEXT itself: any correct content-hash equality
    // grouping (md5 or the xxhash64 pair) must reproduce it exactly
    "d_exact_fast" ->
      """WITH rep AS (SELECT text, min(doc_id) AS canonical, count(*) AS group_size
        |             FROM documents GROUP BY text)
        |SELECT d.doc_id::BIGINT AS doc_id, rep.canonical::BIGINT AS canonical,
        |       rep.group_size::BIGINT AS group_size
        |FROM documents d JOIN rep ON d.text = rep.text ORDER BY doc_id""".stripMargin,

    "d_minhash_sig" -> {
      val mh = (0 until 4).map(i => s"min(md5('$i:' || tok)) AS mh$i").mkString(", ")
      s"""WITH toks AS (${toksSql(docsSql)}),
         | dt AS (SELECT DISTINCT doc_id, tok FROM toks)
         |SELECT doc_id::BIGINT AS doc_id, $mh
         |FROM dt GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "d_minhash_lsh" -> {
      val mh = (0 until 4).map(i => s"min(md5('$i:' || tok)) AS mh$i").mkString(", ")
      s"""WITH toks AS (${toksSql(docsSql)}),
         | dt AS (SELECT DISTINCT doc_id, tok FROM toks),
         | sig AS (SELECT doc_id, $mh FROM dt GROUP BY doc_id),
         | bands AS (
         |   SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS bh FROM sig
         |   UNION ALL
         |   SELECT doc_id, 1 AS band, md5(mh2 || '|' || mh3) AS bh FROM sig)
         |SELECT l.doc_id::BIGINT AS a, r.doc_id::BIGINT AS b, count(*)::BIGINT AS n_shared_bands
         |FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
         |GROUP BY l.doc_id, r.doc_id ORDER BY a, b""".stripMargin
    },

    "d_lsh_oversized" -> {
      val mh = (0 until 4).map(i => s"min(md5('$i:' || tok)) AS mh$i").mkString(", ")
      s"""WITH toks AS (${toksSql(docsSql)}),
         | dt AS (SELECT DISTINCT doc_id, tok FROM toks),
         | sig AS (SELECT doc_id, $mh FROM dt GROUP BY doc_id),
         | bands AS (
         |   SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS bh FROM sig
         |   UNION ALL
         |   SELECT doc_id, 1 AS band, md5(mh2 || '|' || mh3) AS bh FROM sig)
         |SELECT band::BIGINT AS band, bh, count(*)::BIGINT AS bn
         |FROM bands GROUP BY band, bh HAVING count(*) > 40 ORDER BY band, bh""".stripMargin
    },

    "d_ngram_jaccard" ->
      s"""WITH toks AS (
         |  SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         |               generate_subscripts(string_split(text, ' '), 1) AS pos
         |        FROM documents WHERE text <> '')
         |  WHERE tok <> ''
         |), sh0 AS (
         |  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS sh
         |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
         |              JOIN toks c ON c.doc_id = a.doc_id AND c.idx = a.idx + 2
         |), rare AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100),
         | sh AS (SELECT doc_id, sh0.sh FROM sh0 JOIN rare USING (sh)
         |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         | pairs AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS common
         |  FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc_id < r.doc_id
         |  GROUP BY l.doc_id, r.doc_id)
         |SELECT p.a::BIGINT AS a, p.b::BIGINT AS b,
         |       round(p.common::DOUBLE / (sa.n + sb.n - p.common), 6) AS jaccard
         |FROM pairs p JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
         |ORDER BY jaccard DESC, a ASC, b ASC LIMIT 50""".stripMargin,

    "d_simhash" -> OracleSqlGen.simHashSql(docsSql, "doc_id", "text", bits = 16)
  )
}
