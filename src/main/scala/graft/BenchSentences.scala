package graft

import graft.lang.{Detector, DetectorConfig, ScriptLang}
import graft.train.FixtureCorpus

/** The reference's detector micro-bench structure (FIXTURES.md F6;
  * reference: bench/benches/benchmark.rs:26-43 sentences, :7-24 common
  * languages, :45-121 groups): time per 12-sentence batch under
  * {all languages, 12 common languages} × {all n-grams, max-trigrams},
  * single-threaded `detect_top_one_raw`.
  */
object BenchSentences {

  /** One sentence per language (ar,nl,en,fr,de,hi,it,pt,ru,es,sv,tr). */
  val sentences: Vector[String] = Vector(
    "و في نفس الوقت أقول بأن الشيخ صالح لم يشر إلى مسؤولية الدولة التي تسمح لمواطنيها بملكية قنوات تبث ما تبث بل إنه حصر المسؤولية على ملاك هذه القنوات.",
    "Aan de fysieke gesteldheid van de aspirant-beoefenaar worden geen bijzondere eisen gesteld anders dan een goede gezondheid.",
    "Here, in a region abundant with natural beauty, golfers will surely be rewarded with an exceptional golf experience.",
    "Les affranchissements étaient très rares et s'ils accordaient la liberté à l'ancien esclave, ils ne lui conféraient pas le titre de citoyen.",
    "Natürlich war sie kein Pferd, dachte sie, aber warum wurde sie dann geritten, hatte einen Reiter zu tragen, war gesattelt, bekam Sporen und Lederpeitsche?",
    "अब इन्हें एक अलग प्लेट में निकाल कर गरमा-गरम आलू की सब्जी, हरे धनिये की चटनी या मीठी चटनी के साथ परोस कर खाइये और सबको खिलाइये।",
    "Alla fine del secolo cambiarono nome, divenendo uno Capitano e l’altro Difensore, ma mantenendo le stesse caratteristiche degli anni precedenti.",
    "Dizer que não estou, significaria explicar porquê e não me apetece nada desfiar o rosário das minhas lamentações.",
    "То есть присяжные не сочли возможным осудить за соучастие в убийстве и убийство людей, доказательства вины которых не были предъявлены.",
    "Con frecuencia creo que Francia es malinterpretada, seala, aludiendo a la imagen que tiene el pas internacionalmente en materia de tica de trabajo.",
    "Med dagens stadshusmajoritet är det övervikt för ett enplanstorg med bostäder, alltså för en ombyggnad i linje med alternativ maxi.",
    "Mezuniyet hediyesi olarak yerleşkenin kuzey batı bölümüne dikilmiş vişnelerin meyvesini, tohumunu almışlardır."
  )

  val commonLanguages: Set[String] =
    Set("arb", "nld", "eng", "fra", "deu", "hin", "ita", "por", "rus", "spa", "swe", "tur")

  /** Run the 4 criterion groups; returns group → microseconds per
    * 12-sentence batch (median of `reps` runs after warmup).
    */
  def run(reps: Int = 60): Map[String, Double] = {
    val model = FixtureCorpus.model
    val allFull = new Detector(model, DetectorConfig.default)
    val allTri = new Detector(model, DetectorConfig.default.maxTrigrams)
    val commonSet = commonLanguages.map(ScriptLang.id)
    val comFull = new Detector(model, DetectorConfig.default.copy(languages = commonSet))
    val comTri = new Detector(model, DetectorConfig.default.copy(languages = commonSet).maxTrigrams)

    def batch(d: Detector): Unit = {
      var i = 0
      while (i < sentences.length) { d.detectTopOneRaw(sentences(i)); i += 1 }
    }
    def timeGroup(d: Detector): Double = {
      var w = 0
      while (w < 20) { batch(d); w += 1 } // warmup
      val times = new Array[Double](reps)
      var r = 0
      while (r < reps) {
        val t0 = System.nanoTime()
        batch(d)
        times(r) = (System.nanoTime() - t0) / 1e3
        r += 1
      }
      java.util.Arrays.sort(times)
      times(reps / 2)
    }

    Map(
      "all_langs_all_ngrams_us" -> timeGroup(allFull),
      "all_langs_max_trigrams_us" -> timeGroup(allTri),
      "common_langs_all_ngrams_us" -> timeGroup(comFull),
      "common_langs_max_trigrams_us" -> timeGroup(comTri)
    )
  }
}
