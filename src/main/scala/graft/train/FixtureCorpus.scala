package graft.train

/** Deterministic per-language fixture corpus (FIXTURES.md F3): a seeded
  * generator over orthography-characteristic vocabularies, mirroring
  * OpenLID's file-per-language layout (reference: train/README.md:6-10).
  * No wall-clock, no randomness source beyond the fixed LCG seed.
  */
object FixtureCorpus {

  /** xorshift64* PRNG — deterministic, seedable, no java.util.Random. */
  final class Rng(seed0: Long) {
    private var s: Long = if (seed0 == 0L) 0x9e3779b97f4a7c15L else seed0
    def nextLong(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545f4914f6cdd1dL
    }
    def nextInt(bound: Int): Int = {
      val r = nextLong() >>> 1
      (r % bound).toInt
    }
  }

  /** Common-word vocabularies (public orthography knowledge). Each word must
    * pass the trainer's all-chars-in-alphabet filter to contribute. The
    * pipeline's 8 core languages are defined here; ~32 more golden-corpus
    * languages merge in from GoldenFixtures.vocab (see `vocab` below).
    */
  val coreVocab: Map[String, Vector[String]] = Map(
    "eng" -> Vector(
      "the", "of", "and", "a", "to", "in", "is", "i", "m", "s", "t", "was", "for", "that", "with",
      "house", "water", "world", "people", "time", "year", "good", "know",
      "make", "think", "about", "which", "would", "there", "their", "other",
      "love", "you", "this", "have", "from", "they", "been", "more", "when",
      "will", "what", "where", "who", "work", "life", "day", "thing", "man",
      "woman", "child", "school", "state", "family", "student", "group",
      "country", "problem", "hand", "part", "place", "case", "week", "company",
      "right", "question", "night", "point", "home", "little", "room", "mother",
      "hello", "how", "are", "well", "thank", "am", "massage",
      "vibrator", "sometimes", "described", "as", "sex", "toy", "used", "on",
      "body", "produce", "pleasurable", "sexual", "stimulation",
      "individual", "visible", "ability", "indivisible", "indivisibility"
    ),
    "deu" -> Vector(
      "der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "eine",
      "haus", "wasser", "welt", "leute", "zeit", "jahr", "gut", "wissen",
      "machen", "denken", "über", "welche", "würde", "dort", "ihre", "andere",
      "straße", "groß", "größe", "müssen", "können", "schön", "für", "aber",
      "auch", "wenn", "nach", "durch", "alter", "mann", "frau", "kind",
      "schule", "staat", "familie", "arbeit", "leben", "tag", "nacht", "haben",
      "werden", "höher", "überrascht", "zurück", "natürlich", "deutsch",
      "sprechen", "verstehen", "bitte", "danke", "heute", "morgen", "immer"
    ),
    "fra" -> Vector(
      "le", "la", "les", "de", "et", "est", "je", "ne", "pas", "avec",
      "maison", "eau", "monde", "gens", "temps", "année", "bon", "savoir",
      "faire", "penser", "sur", "quelle", "serait", "là", "leur", "autre",
      "être", "avoir", "tout", "mais", "nous", "vous", "dans", "pour",
      "contrôle", "façonnage", "forêt", "où", "succèdent", "très", "après",
      "français", "toujours", "jamais", "aujourd", "hui", "demain", "merci",
      "école", "état", "famille", "travail", "vie", "jour", "nuit", "même",
      "quelque", "chose", "homme", "femme", "enfant", "père", "mère"
    ),
    "spa" -> Vector(
      "el", "la", "los", "de", "y", "es", "yo", "no", "con", "una",
      "casa", "agua", "mundo", "gente", "tiempo", "año", "años", "bueno",
      "saber", "hacer", "pensar", "sobre", "cual", "sería", "allí", "su",
      "otro", "ser", "estar", "tener", "pero", "nosotros", "usted", "para",
      "que", "como", "más", "también", "cuando", "después", "español",
      "siempre", "nunca", "hoy", "mañana", "gracias", "escuela", "estado",
      "familia", "trabajo", "vida", "día", "noche", "mismo", "algo",
      "hombre", "mujer", "niño", "padre", "madre", "ciudad", "país"
    ),
    "por" -> Vector(
      "o", "a", "os", "de", "e", "é", "eu", "não", "com", "uma",
      "casa", "água", "mundo", "pessoas", "tempo", "ano", "bom", "saber",
      "fazer", "pensar", "sobre", "qual", "seria", "lá", "seu", "outro",
      "ser", "estar", "ter", "mas", "nós", "você", "para", "visão",
      "coração", "ação", "então", "também", "quando", "depois", "português",
      "sempre", "nunca", "hoje", "amanhã", "obrigado", "escola", "estado",
      "família", "trabalho", "vida", "dia", "noite", "mesmo", "alguma",
      "coisa", "homem", "mulher", "criança", "pai", "mãe", "cidade", "país"
    ),
    "ita" -> Vector(
      "il", "la", "gli", "di", "e", "è", "io", "non", "con", "una",
      "casa", "acqua", "mondo", "gente", "tempo", "anno", "buono", "sapere",
      "fare", "pensare", "sopra", "quale", "sarebbe", "là", "loro", "altro",
      "essere", "avere", "ma", "noi", "voi", "per", "venerdì", "città",
      "perché", "anche", "quando", "dopo", "italiano", "sempre", "mai",
      "oggi", "domani", "grazie", "scuola", "stato", "famiglia", "lavoro",
      "vita", "giorno", "notte", "stesso", "qualcosa", "uomo", "donna",
      "bambino", "padre", "madre", "paese", "più", "però", "così"
    ),
    "nld" -> Vector(
      "de", "het", "een", "van", "en", "is", "ik", "niet", "met", "voor",
      "huis", "water", "wereld", "mensen", "tijd", "jaar", "goed", "weten",
      "maken", "denken", "over", "welke", "zou", "daar", "hun", "andere",
      "zijn", "hebben", "maar", "wij", "jij", "naar", "ook", "als",
      "nederlands", "altijd", "nooit", "vandaag", "morgen", "dank",
      "school", "staat", "familie", "werk", "leven", "dag", "nacht",
      "zelfde", "iets", "man", "vrouw", "kind", "vader", "moeder", "stad"
    ),
    "rus" -> Vector(
      "и", "в", "не", "на", "я", "что", "он", "с", "это", "быть",
      "дом", "вода", "мир", "люди", "время", "год", "хорошо", "знать",
      "делать", "думать", "этот", "который", "там", "их", "другой",
      "огнём", "сопротивление", "работа", "жизнь", "день", "ночь",
      "человек", "женщина", "ребёнок", "школа", "государство", "семья",
      "всегда", "никогда", "сегодня", "завтра", "спасибо", "город",
      "страна", "слово", "рука", "место", "вопрос", "ответ", "мама"
    )
  )

  /** Full vocabulary: pipeline core languages + golden-corpus languages. */
  val vocab: Map[String, Vector[String]] = coreVocab ++ GoldenFixtures.vocab

  /** Deterministic line corpus for a language: `nLines` lines of 4-12 words
    * drawn Zipf-ish from the vocabulary (rank-weighted).
    */
  def lines(code: String, nLines: Int, seed: Long = 42L): Vector[String] = {
    val v = vocab(code)
    val rng = new Rng(seed ^ code.hashCode.toLong << 17)
    Vector.tabulate(nLines) { _ =>
      val n = 4 + rng.nextInt(9)
      val words = Vector.fill(n) {
        // rank-weighted pick: min of two uniforms skews to low ranks
        val a = rng.nextInt(v.size)
        val b = rng.nextInt(v.size)
        v(math.min(a, b))
      }
      words.mkString(" ")
    }
  }

  def corpus(nLinesPerLang: Int = 200, langs: Seq[String] = vocab.keys.toSeq.sorted)
      : Seq[(String, Seq[String])] =
    langs.map(c => c -> lines(c, nLinesPerLang))

  /** The default packed fixture model over all fixture languages. */
  lazy val model: graft.lang.PackedModel = ModelIO.trainPacked(corpus())
}
