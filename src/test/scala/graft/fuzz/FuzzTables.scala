package graft.fuzz

import java.sql.Timestamp
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Seeded hostile-table generator for the relational fuzz gates (VERDICT
  * r7 #5): schema-exact twins of the ten driver tables populated with the
  * hostile region the clean testdata never reaches — nulls in every
  * column a query can survive them in, empty and control-character
  * strings, duplicate and orphan keys, NaN/±Inf/−0.0, epoch-negative and
  * far-future timestamps, boundary-exact sessionize gaps, zero-norm and
  * non-finite embeddings, planted duplicate/near-duplicate documents.
  *
  * Two profiles:
  *
  *  - [[FuzzTables.OracleSafe]] — every value class here keeps the DuckDB
  *    oracle compare meaningful, so `graft.Verify` + compare_oracle can
  *    run over the generated directory exactly like the driver's gate.
  *    The constraints, each forced by a specific oracle, are:
  *      * doubles are exact dyadics (k·2⁻⁷, |v| ≤ 8192): float sums are
  *        order-dependent in general, and Spark and DuckDB sum in
  *        different orders — on an exact-dyadic grid every partial sum is
  *        exactly representable, so `round(sum(x),2)` is bit-equal on
  *        both engines and the gate tests SEMANTICS, not association
  *        order. NaN/±Inf/−0.0 ride along where both engines agree
  *        (sum/min/max/round/group-by — probed, see RelationalFuzzSpec).
  *      * NaN/±Inf stay OUT of l_extendedprice/l_quantity: they are
  *        q32's measures, and DuckDB's quantile_cont sorts NaN smallest
  *        while Spark sorts it largest (probed) — a convention gap, not
  *        a bug. Null measures are fine (both engines skip them).
  *      * documents.text is hostile ASCII only (-, no NUL):
  *        the q27/q37 oracles slice VARCHAR as a stand-in for the binary
  *        payload (bytes == chars only for ASCII, SparkEntry comment),
  *        and DuckDB rejects NUL in VARCHAR. [a-z] runs are capped at 60
  *        chars (the q29 trainer oracle enumerates gram positions 1..64).
  *      * part.p_name/p_brand/p_type are hostile ASCII: q33 applies
  *        upper()/levenshtein(), whose non-ASCII conventions (ß→SS,
  *        astral code-point counting) differ between ICU-ish engines.
  *      * o_orderkey, event_id, user_id, doc_id, vec_id are non-null and
  *        (doc_id, vec_id) unique: they are sort tiebreaks (q05/q06/q10)
  *        or pair identities (q17/q19/q20) — null tiebreaks hit engine
  *        null-ordering conventions, duplicate identities make the
  *        brute-force pair oracles multiset-ambiguous.
  *      * event ts is non-null and strictly increasing per user: ASOF
  *        (q31) is nondeterministic under tied view timestamps in BOTH
  *        engines; gaps still land exactly on the 1800 s sessionize
  *        boundary (q10), at 1 µs, and at 30 days.
  *      * documents.lang ∈ {en,de,fr,es,zh} and source is non-null: the
  *        q29 oracle maps exactly those codes; q19 partitions by source.
  *      * embeddings are fixed dim-64 when present; zero-norm,
  *        NaN-element, ±Inf-element, exact-duplicate AND NULL vectors
  *        ARE included — the ANN oracles encode the engine's NaN→0.0
  *        corrupt-cosine convention explicitly, and q20/q26/q30 filter
  *        NULL embeddings on both engines (q38 counts them). Ragged/
  *        empty arrays stay Full-only (DuckDB list_dot_product length
  *        conventions differ).
  *
  *  - [[FuzzTables.Full]] — superset for the in-JVM no-crash/determinism
  *    gate (no DuckDB in the loop): full hostile Unicode in text and
  *    part strings (astral, combining-only, noncharacters, LONE
  *    SURROGATES, NUL), null text/source/user_id/o_orderkey/timestamps,
  *    duplicate doc_ids, NaN in the q32 measures, Long.MinValue/MaxValue
  *    keys, and ragged embeddings (empty and short arrays, null rows).
  *
  * Deterministic by construction: one java.util.Random per table, seeded
  * by (seed, table name); same (seed, profile) → identical tables.
  */
object FuzzTables {

  sealed trait Profile { def full: Boolean }
  case object OracleSafe extends Profile { val full = false }
  case object Full extends Profile { val full = true }

  private val TsLo = Timestamp.valueOf("1900-01-01 00:00:00").getTime // ms, negative epoch
  private val TsHi = Timestamp.valueOf("2199-12-31 00:00:00").getTime // < pandas ns ceiling

  // ---- scalar hostility helpers -------------------------------------

  /** Exact dyadic on the 2^-7 grid, |v| <= maxAbs (sums stay exact). */
  private def dyadic(r: Random, maxAbs: Int): Double =
    (r.nextInt(2 * maxAbs * 128 + 1) - maxAbs * 128) / 128.0

  /** Dyadic grid plus the non-finite specials both engines agree on. */
  private def hostileDouble(r: Random, maxAbs: Int, specials: Boolean): Any =
    r.nextInt(100) match {
      case 0 => null
      case 1 if specials => Double.NaN
      case 2 if specials => Double.PositiveInfinity
      case 3 if specials => Double.NegativeInfinity
      case 4 => -0.0
      case 5 => 0.0
      case _ => dyadic(r, maxAbs)
    }

  /** Finite-only variant for the q32 measure columns (OracleSafe); the
    * Full profile re-admits NaN there. */
  private def measureDouble(r: Random, maxAbs: Int, full: Boolean): Any =
    r.nextInt(100) match {
      case 0 => null
      case 1 if full => Double.NaN
      case 2 => -0.0
      case _ => dyadic(r, maxAbs)
    }

  private[graft] def hostileTs(r: Random): Timestamp = {
    val t = r.nextInt(20) match {
      case 0 => TsLo // negative epoch
      case 1 => TsHi
      case 2 => 0L // the epoch itself
      case _ => // bulk: 1990..2030, microsecond-odd
        Timestamp.valueOf("1990-01-01 00:00:00").getTime +
          (r.nextDouble() * 40L * 365 * 86400 * 1000).toLong
    }
    val ts = new Timestamp(t)
    ts.setNanos(r.nextInt(1000000) * 1000) // keep micros (parquet unit)
    ts
  }

  private val asciiWords: IndexedSeq[String] = {
    val base = Vector("the", "a", "of", "and", "to", "in", "web", "page", "data",
      "spark", "filter", "crawl", "quality", "text", "dedup", "model", "train",
      "zz", "q", "x9", "HTML", "UPPER", "MiXeD", "don't", "e.g.", "42", "3.14",
      "---", "__", "!!!", "??", "(paren)", "[brk]", "a,b", "semi;colon")
    val runs = Vector("a" * 60, "z" * 37, "ab" * 25, "qx" * 12) // <= 64 (q29 oracle cap)
    val scrubShapes = Vector("bob@example.com", "a@b.co", "not@an@email",
      "10.0.0.1", "999.999.999.999", "1.2.3.4.5",
      "+1 (800) 555-0100", "0800 123 4567", "12345678901")
    val controls = Vector("ctl", "tab\there", "nl\ninside", "", "")
    base ++ runs ++ scrubShapes ++ controls
  }

  /** Hostile-ASCII document text: repeated-word, empty, single-char,
    * double-space, long, and ordinary mixtures. */
  private[graft] def asciiText(r: Random): String = r.nextInt(20) match {
    case 0 => ""
    case 1 => asciiWords(r.nextInt(asciiWords.size))
    case 2 => // repetition-heavy (q25 max ratio)
      val w = asciiWords(r.nextInt(asciiWords.size))
      Seq.fill(5 + r.nextInt(40))(w).mkString(" ")
    case 3 => // double/leading/trailing spaces (empty split tokens)
      " " + Seq.fill(3 + r.nextInt(8))(asciiWords(r.nextInt(asciiWords.size))).mkString("  ") + " "
    case 4 => // long doc
      Seq.fill(200 + r.nextInt(300))(asciiWords(r.nextInt(asciiWords.size))).mkString(" ")
    case _ =>
      Seq.fill(3 + r.nextInt(60))(asciiWords(r.nextInt(asciiWords.size))).mkString(" ")
  }

  /** Full-profile Unicode text: the FuzzSpec code-point classes, including
    * lone surrogates and NUL (valid Java strings; never read by DuckDB). */
  private[graft] def unicodeText(r: Random): String = {
    val n = r.nextInt(4) match {
      case 0 => 0
      case 1 => 1 + r.nextInt(3)
      case _ => 2 + r.nextInt(120)
    }
    val sb = new java.lang.StringBuilder(n * 2)
    (0 until n).foreach { _ =>
      val cp = r.nextInt(14) match {
        case 0 | 1 | 2 => ' '.toInt
        case 3 | 4 | 5 => 0x21 + r.nextInt(0x5e) // printable ASCII
        case 6 => r.nextInt(0x20) // C0 incl NUL
        case 7 => 0xa0 + r.nextInt(0x260)
        case 8 => 0x300 + r.nextInt(0x70) // combining
        case 9 => Seq(0x5d0, 0x631, 0x4e2d, 0x930, 0xe01, 0xac00)(r.nextInt(6))
        case 10 => 0x1f300 + r.nextInt(0x700) // astral emoji
        case 11 => Seq(0xfdd0, 0xfffe, 0xffff, 0x10fffe)(r.nextInt(4)) // noncharacters
        case 12 => 0xd800 + r.nextInt(0x800) // LONE SURROGATE
        case _ => 0x10400 + r.nextInt(0x50) // Deseret
      }
      sb.append(Character.toChars(cp))
    }
    sb.toString
  }

  private def hostileName(r: Random, full: Boolean): Any = r.nextInt(12) match {
    case 0 => null
    case 1 => ""
    case 2 => " "
    case 3 => "ctl"
    case 4 if full => unicodeText(r)
    case 5 => "x" * (40 + r.nextInt(160))
    case _ => "name_" + r.nextInt(50)
  }

  // ---- table builders -------------------------------------------------

  private def rng(seed: Long, table: String) =
    new Random(seed * 1000003L + table.hashCode)

  private def field(name: String, dt: DataType, nullable: Boolean = true) =
    StructField(name, dt, nullable)

  def write(spark: SparkSession, seed: Long, dir: String, profile: Profile): String = {
    val full = profile.full
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))

    def save(name: String, schema: StructType, rows: Seq[Row]): Unit = {
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema)
      df.repartition(4).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }

    // region: duplicate key, negative key, hostile names
    locally {
      val r = rng(seed, "region")
      val rows = (0 until 5).map(i => Row(i, hostileName(r, full))) :+
        Row(2, "DUP_REGION") :+ Row(-1, null)
      save("region", StructType(Seq(field("r_regionkey", IntegerType),
        field("r_name", StringType))), rows)
    }

    // nation: orphan r_regionkey refs, null regionkey, dup nationkey
    locally {
      val r = rng(seed, "nation")
      val rows = (0 until 25).map { i =>
        val reg: Any = r.nextInt(10) match {
          case 0 => null
          case 1 => 99 // orphan
          case _ => r.nextInt(5)
        }
        Row(i, hostileName(r, full), reg)
      } :+ Row(3, "DUP_NATION", 0) :+ Row(-7, "", -1)
      save("nation", StructType(Seq(field("n_nationkey", IntegerType),
        field("n_name", StringType), field("n_regionkey", IntegerType))), rows)
    }

    // customer: null/dup custkeys (EXISTS-style q08 oracle is null-safe),
    // orphan nationkeys, non-finite acctbal
    locally {
      val r = rng(seed, "customer")
      val rows = (0 until 300).map { i =>
        val ck: Any = if (r.nextInt(50) == 0) null
          else if (r.nextInt(10) == 0) r.nextInt(40).toLong // dup-heavy band
          else i.toLong
        val nk: Any = r.nextInt(12) match {
          case 0 => null
          case 1 => 999 // orphan
          case _ => r.nextInt(25)
        }
        val seg: Any = r.nextInt(8) match {
          case 0 => null
          case 1 => ""
          case 2 => "セグメント" // group key only: unicode is oracle-safe here
          case _ => Seq("BUILDING", "MACHINERY", "AUTOMOBILE")(r.nextInt(3))
        }
        Row(ck, hostileName(r, full), nk, hostileDouble(r, 4096, specials = true), seg)
      }
      save("customer", StructType(Seq(field("c_custkey", LongType),
        field("c_name", StringType), field("c_nationkey", IntegerType),
        field("c_acctbal", DoubleType), field("c_mktsegment", StringType))), rows)
    }

    // supplier
    locally {
      val r = rng(seed, "supplier")
      val rows = (0 until 60).map { i =>
        val nk: Any = if (r.nextInt(10) == 0) null else r.nextInt(25)
        Row(i.toLong, hostileName(r, full), nk, hostileDouble(r, 4096, specials = true))
      }
      save("supplier", StructType(Seq(field("s_suppkey", LongType),
        field("s_name", StringType), field("s_nationkey", IntegerType),
        field("s_acctbal", DoubleType))), rows)
    }

    // part: q33 applies upper/substr/levenshtein — ASCII-hostile strings in
    // OracleSafe (unicode case/width conventions differ), unicode in Full
    locally {
      val r = rng(seed, "part")
      def pstr(): Any = r.nextInt(10) match {
        case 0 => null
        case 1 => ""
        case 2 => " lead and trail "
        case 3 => "MiXeD-CaSe_1234!@#"
        case 4 => "x" * (30 + r.nextInt(200))
        case 5 if full => unicodeText(r)
        case _ => "part type " + ("abcdefgh".substring(0, 1 + r.nextInt(7)))
      }
      val rows = (0 until 220).map { i =>
        val pk: Any = if (r.nextInt(40) == 0) null
          else if (r.nextInt(8) == 0) r.nextInt(30).toLong
          else i.toLong
        val size: Any = r.nextInt(15) match {
          case 0 => null
          case 1 => Int.MinValue
          case 2 => Int.MaxValue
          case _ => r.nextInt(50) - 5
        }
        Row(pk, pstr(), pstr(), pstr(), size, hostileDouble(r, 2048, specials = true))
      }
      save("part", StructType(Seq(field("p_partkey", LongType),
        field("p_name", StringType), field("p_brand", StringType),
        field("p_type", StringType), field("p_size", IntegerType),
        field("p_retailprice", DoubleType))), rows)
    }

    // orders: o_orderkey non-null (q05/q06 tiebreak) with dups; null
    // custkeys; non-finite totalprice; extreme/null dates
    locally {
      val r = rng(seed, "orders")
      val rows = (0 until 900).map { i =>
        val ok: Any =
          if (full && r.nextInt(60) == 0) null
          else if (r.nextInt(12) == 0) (i / 3).toLong // dup band
          else i.toLong
        val ck: Any = r.nextInt(15) match {
          case 0 => null
          case 1 => 99999L // orphan
          case _ => r.nextInt(320).toLong
        }
        val st: Any = r.nextInt(10) match {
          case 0 => null; case 1 => ""
          case _ => Seq("O", "F", "P")(r.nextInt(3))
        }
        val date: Any = if (r.nextInt(12) == 0) null else hostileTs(r)
        val pri: Any = r.nextInt(12) match {
          case 0 => null; case 1 => ""; case 2 => "优先"
          case _ => Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW", "5-NONE")(r.nextInt(5))
        }
        Row(ok, ck, st, hostileDouble(r, 8192, specials = true), date, pri)
      }
      save("orders", StructType(Seq(field("o_orderkey", LongType, nullable = full),
        field("o_custkey", LongType), field("o_orderstatus", StringType),
        field("o_totalprice", DoubleType), field("o_orderdate", TimestampType),
        field("o_orderpriority", StringType))), rows)
    }

    // lineitem: q32 measures finite-dyadic in OracleSafe (quantile_cont
    // NaN convention gap), NaN re-admitted in Full; hostile group keys
    locally {
      val r = rng(seed, "lineitem")
      val rows = (0 until 2600).map { _ =>
        val lok: Any = r.nextInt(20) match {
          case 0 => null
          case 1 => 999999L // orphan
          case _ => r.nextInt(900).toLong
        }
        val pk: Any = if (r.nextInt(25) == 0) null else r.nextInt(260).toLong
        val sk: Any = if (r.nextInt(25) == 0) null else r.nextInt(70).toLong
        val ln: Any = if (r.nextInt(30) == 0) null else r.nextInt(8) - 1
        val flag: Any = r.nextInt(12) match {
          case 0 => null; case 1 => ""; case 2 => ""
          case _ => Seq("A", "N", "R")(r.nextInt(3))
        }
        val status: Any = r.nextInt(10) match {
          case 0 => null; case 1 => ""
          case _ => Seq("O", "F")(r.nextInt(2))
        }
        val ship: Any = if (r.nextInt(15) == 0) null else hostileTs(r)
        Row(lok, pk, sk, ln,
          measureDouble(r, 64, full), measureDouble(r, 8192, full),
          hostileDouble(r, 1, specials = true), hostileDouble(r, 1, specials = true),
          flag, status, ship)
      }
      save("lineitem", StructType(Seq(field("l_orderkey", LongType),
        field("l_partkey", LongType), field("l_suppkey", LongType),
        field("l_linenumber", IntegerType), field("l_quantity", DoubleType),
        field("l_extendedprice", DoubleType), field("l_discount", DoubleType),
        field("l_tax", DoubleType), field("l_returnflag", StringType),
        field("l_linestatus", StringType), field("l_shipdate", TimestampType))), rows)
    }

    // events: strictly increasing ts per user (ASOF determinism) with
    // boundary-exact sessionize gaps; Full adds null ts/user_id
    locally {
      val r = rng(seed, "events")
      val rows = ArrayBuffer[Row]()
      var eid = 0L
      (0 until 40).foreach { u =>
        var t = Timestamp.valueOf("1994-01-01 00:00:00").getTime * 1000 + // micros
          u.toLong * 1000000L
        val n = 10 + r.nextInt(70)
        (0 until n).foreach { _ =>
          val gapMicros = r.nextInt(12) match {
            case 0 => 1L // 1 µs
            case 1 => 1799L * 1000000 // just under the session boundary
            case 2 => 1800L * 1000000 // exactly ON it (q10: > 1800 is new)
            case 3 => 1801L * 1000000 // just over
            case 4 => 30L * 86400 * 1000000 // 30 days
            case _ => 1000000L + r.nextInt(3600) * 1000000L
          }
          t += gapMicros
          val ts: Any =
            if (full && r.nextInt(80) == 0) null
            else { val x = new Timestamp(t / 1000); x.setNanos((t % 1000000).toInt * 1000); x }
          val uid: Any = if (full && r.nextInt(60) == 0) null else u.toLong
          val et: Any = r.nextInt(12) match {
            case 0 => null; case 1 => ""; case 2 => "クリック"
            case _ => Seq("click", "view", "purchase")(r.nextInt(3))
          }
          val props: Any = if (full) unicodeText(r)
            else if (r.nextInt(10) == 0) null else asciiText(r).take(80)
          rows += Row(eid, ts, uid, et, hostileDouble(r, 512, specials = true), props)
          eid += 1
        }
      }
      save("events", StructType(Seq(field("event_id", LongType, nullable = false),
        field("ts", TimestampType), field("user_id", LongType),
        field("event_type", StringType), field("value", DoubleType),
        field("props", StringType))), rows.toSeq)
    }

    // documents: planted exact-dup and near-dup clusters, repetition and
    // scrub shapes; ASCII-only text + unique doc_ids in OracleSafe
    locally {
      val r = rng(seed, "documents")
      val langs = Seq("en", "de", "fr", "es", "zh")
      val sources = Seq("web", "wiki", "cc", "")
      val rows = ArrayBuffer[Row]()
      var id = 0L
      def add(text: Any, src: String): Unit = {
        val lang = langs(r.nextInt(langs.size))
        val did = if (full && r.nextInt(40) == 0 && id > 0) id - 1 else id
        val nchars: Any = text match {
          case s: String => s.codePointCount(0, s.length).toLong
          case _ => null
        }
        rows += Row(did, text, lang, src, nchars)
        id += 1
      }
      // base population
      (0 until 260).foreach { _ =>
        val text: Any =
          if (r.nextInt(60) == 0) null
          else if (full && r.nextInt(3) == 0) unicodeText(r)
          else asciiText(r)
        add(text, sources(r.nextInt(sources.size)))
      }
      // planted exact duplicates (q16)
      (0 until 6).foreach { _ =>
        val t = asciiText(r)
        val s = sources(r.nextInt(sources.size))
        add(t, s); add(t, s); if (r.nextBoolean()) add(t, sources(r.nextInt(sources.size)))
      }
      // planted near-duplicate clusters (q17 >= 0.7 global, q19 >= 0.3
      // within source): long-ish base, mutate a few words
      (0 until 8).foreach { _ =>
        val words = ArrayBuffer.fill(40 + r.nextInt(60))(asciiWords(r.nextInt(asciiWords.size)))
        val s = sources(r.nextInt(sources.size))
        add(words.mkString(" "), s)
        (0 until 1 + r.nextInt(3)).foreach { _ =>
          val m = words.clone()
          (0 until 1 + r.nextInt(4)).foreach { _ =>
            m(r.nextInt(m.size)) = asciiWords(r.nextInt(asciiWords.size))
          }
          add(m.mkString(" "), if (r.nextInt(4) == 0) sources(r.nextInt(sources.size)) else s)
        }
      }
      save("documents", StructType(Seq(field("doc_id", LongType, nullable = false),
        field("text", StringType), field("lang", StringType),
        field("source", StringType, nullable = full), field("n_chars", LongType))), rows.toSeq)
    }

    // embeddings: dim-64 dyadic floats; zero-norm, NaN-element,
    // Inf-element, exact-duplicate, null vectors; Full adds ragged arrays
    locally {
      val r = rng(seed, "embeddings")
      val dim = 64
      def vec(): Array[Float] =
        Array.fill(dim)((r.nextInt(513) - 256) / 64.0f) // 2^-6 grid, |v| <= 4
      val rows = ArrayBuffer[Row]()
      var prev: Array[Float] = vec()
      (0 until 160).foreach { i =>
        val v: Any = r.nextInt(20) match {
          case 0 => Array.fill(dim)(0.0f) // zero norm → NaN cosine → 0.0 convention
          case 1 => { val x = vec(); x(r.nextInt(dim)) = Float.NaN; x }
          case 2 => { val x = vec(); x(r.nextInt(dim)) = Float.PositiveInfinity; x }
          case 3 => prev.clone() // exact duplicate (cos = 1 ties)
          case 4 => { val x = vec(); x(r.nextInt(dim)) = -0.0f; x }
          case 5 if full => Array.empty[Float]
          case 6 if full => Array.fill(3)(1.0f) // ragged dim
          // null embeddings are ORACLE-SAFE (r9): every embedding query
          // either filters them (q20/q26/q30, WHERE embedding IS NOT NULL
          // on both engines) or counts them (q38 n_null) — admitting them
          // here makes the q20 null-filter convention load-bearing on the
          // DuckDB gate (ADVICE r8). Ragged/empty stay Full-only: DuckDB
          // list_dot_product length conventions differ.
          case 7 => null
          case _ => { val x = vec(); prev = x; x }
        }
        val label: Any = if (r.nextInt(12) == 0) null else r.nextInt(8)
        rows += Row(i.toLong, v, label)
      }
      save("embeddings", StructType(Seq(field("vec_id", LongType, nullable = false),
        field("embedding", ArrayType(FloatType, containsNull = false)),
        field("label", IntegerType))), rows.toSeq)
    }

    dir
  }
}
