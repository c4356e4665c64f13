package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Support._

/** LLM-data-pipeline contract queries (SURVEY.md §2.8c, §2.9 Q60–Q67):
  * exact dedup, n-gram Jaccard near-dup, cosine similarity search, text
  * analysis, TF-IDF, and the custom-function surface (shingles UDTF,
  * cosine_similarity expression, geomean UDAF).
  */
object TextVec {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val defs: Seq[Q] = Seq(

    dfQ("q60_exact_dedup",
      "SELECT COUNT(*) docs, COUNT(DISTINCT SHA256(text)) uniq_docs FROM documents") { (s, d) =>
      // Exact dedup at scale: hash the content once, group on the 32-byte
      // digest — the shuffle carries hashes, not documents.
      t(s, d, "documents").agg(
        count(lit(1)).as("docs"),
        countDistinct(sha2(col("text"), 256)).as("uniq_docs"))
    },

    dfQ("q60b_dedup_groups",
      """SELECT h, COUNT(*) n FROM (SELECT SHA256(text) h FROM documents) t
        |GROUP BY h HAVING COUNT(*) > 1 ORDER BY n DESC, h""".stripMargin) { (s, d) =>
      t(s, d, "documents").select(sha2(col("text"), 256).as("h"))
        .groupBy("h").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).orderBy(col("n").desc, col("h"))
    },

    sqlQ("q61_ngram_jaccard",
      // Spark side uses the native shingles generator (UDTF, SURVEY §2.8b U3);
      // the intersection join is an equi-join on the shingle string, so it
      // shuffles by shingle — never an N² document cross join.
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, shingle AS s
        |  FROM (SELECT doc_id, shingles(text, 3) FROM documents WHERE doc_id < 150)),
        |cnt AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id da, b.doc_id db, COUNT(*) ix
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT da, db, ROUND(CAST(ix AS DOUBLE) / (ca.n + cb.n - ix), 4) jac
        |FROM inter JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
        |WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.8
        |ORDER BY da, db""".stripMargin,
      """WITH toks AS (
        |  SELECT doc_id, STRING_SPLIT(text,' ') AS ws FROM documents WHERE doc_id < 150),
        |sh AS (
        |  SELECT DISTINCT doc_id, CONCAT(ws[i],' ',ws[i+1],' ',ws[i+2]) AS s
        |  FROM toks CROSS JOIN UNNEST(RANGE(1, LEN(ws)-1)) t(i)),
        |cnt AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id da, b.doc_id db, COUNT(*) ix
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT da, db, ROUND(CAST(ix AS DOUBLE) / (ca.n + cb.n - ix), 4) jac
        |FROM inter JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
        |WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.8
        |ORDER BY da, db""".stripMargin),

    sqlQ("q62_cosine_topk",
      // cosine_similarity is the engine's codegen'd Catalyst expression.
      // Query side (vec_id < 5) is tiny → Catalyst broadcasts it; top-k via
      // row_number per query vector.
      """SELECT q, v, sim FROM (
        |  SELECT a.vec_id q, b.vec_id v,
        |         ROUND(COSINE_SIMILARITY(a.embedding, b.embedding), 6) sim,
        |         ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |                            ORDER BY COSINE_SIMILARITY(a.embedding, b.embedding) DESC, b.vec_id) rn
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 5) t
        |WHERE rn <= 3 ORDER BY q, rn""".stripMargin,
      """SELECT q, v, sim FROM (
        |  SELECT a.vec_id q, b.vec_id v,
        |         ROUND(LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) sim,
        |         ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |                            ORDER BY LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id) rn
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 5) t
        |WHERE rn <= 3 ORDER BY q, rn""".stripMargin),

    dfQ("q62b_multimodal_join",
      """SELECT d.doc_id, d.lang, CAST(LEN(e.embedding) AS BIGINT) dim, d.n_chars
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY d.doc_id LIMIT 200""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .join(t(s, d, "embeddings"), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"),
          size(col("embedding")).cast("long").as("dim"), col("n_chars"))
        .orderBy("doc_id").limit(200)
    },

    dfQ("q63_token_stats",
      """SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) n_tokens, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          col("n_chars"))
        .orderBy("doc_id")
    },

    dfQ("q63b_top_terms",
      """SELECT w, COUNT(*) n FROM (SELECT UNNEST(STRING_SPLIT(text,' ')) w FROM documents) t
        |WHERE w <> '' GROUP BY w ORDER BY n DESC, w LIMIT 20""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(20)
    },

    sqlQ("q64_tfidf",
      """WITH w AS (SELECT doc_id, EXPLODE(SPLIT(text,' ')) AS term FROM documents),
        |tf  AS (SELECT doc_id, term, COUNT(*) f FROM w WHERE term <> '' GROUP BY doc_id, term),
        |df  AS (SELECT term, COUNT(DISTINCT doc_id) d FROM tf GROUP BY term),
        |n   AS (SELECT COUNT(*) nn FROM documents)
        |SELECT doc_id, term, ROUND(f * LN(CAST(nn AS DOUBLE) / d), 6) tfidf
        |FROM (SELECT tf.doc_id, tf.term, tf.f, df.d, n.nn,
        |             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |                                ORDER BY tf.f * LN(CAST(n.nn AS DOUBLE) / df.d) DESC, tf.term) rn
        |      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        |      WHERE tf.doc_id < 20) x
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
      """WITH w AS (SELECT doc_id, UNNEST(STRING_SPLIT(text,' ')) AS term FROM documents),
        |tf  AS (SELECT doc_id, term, COUNT(*) f FROM w WHERE term <> '' GROUP BY doc_id, term),
        |df  AS (SELECT term, COUNT(DISTINCT doc_id) d FROM tf GROUP BY term),
        |n   AS (SELECT COUNT(*) nn FROM documents)
        |SELECT doc_id, term, ROUND(f * LN(CAST(nn AS DOUBLE) / d), 6) tfidf
        |FROM (SELECT tf.doc_id, tf.term, tf.f, df.d, n.nn,
        |             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |                                ORDER BY tf.f * LN(CAST(n.nn AS DOUBLE) / df.d) DESC, tf.term) rn
        |      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        |      WHERE tf.doc_id < 20) x
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin),

    dfQ("q65_lang_stats",
      """SELECT lang, COUNT(*) n, ROUND(AVG(n_chars),4) avg_chars FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      t(s, d, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n"), round(avg("n_chars"), 4).as("avg_chars"))
        .orderBy("lang")
    },

    sqlQ("q66_similar_pairs",
      """SELECT a.vec_id a, b.vec_id b, ROUND(COSINE_SIMILARITY(a.embedding,b.embedding),6) sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 200 AND b.vec_id < 200
        |  AND COSINE_SIMILARITY(a.embedding,b.embedding) > 0.4
        |ORDER BY a.vec_id, b.vec_id""".stripMargin,
      """SELECT a.vec_id a, b.vec_id b, ROUND(LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[],b.embedding::DOUBLE[]),6) sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 200 AND b.vec_id < 200
        |  AND LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[],b.embedding::DOUBLE[]) > 0.4
        |ORDER BY a.vec_id, b.vec_id""".stripMargin),

    sqlQ("q67_geomean",
      """SELECT l_returnflag, ROUND(GEOMEAN(l_quantity), 4) gm FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag, ROUND(EXP(AVG(LN(l_quantity))), 4) gm FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  )
}
