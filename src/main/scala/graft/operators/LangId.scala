package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.expressions.{CtKernel, CtLangId}

/** Model-path language identification: Cavnar\u2013Trenkle character-n-gram
  * profiles (the public 1994 algorithm) trained either on embedded seed
  * text \u2014 zero external data dependency, mirroring how the reference
  * ships a pre-trained compiled model (wimbd/language/map_count.py:7-49
  * uses pycld2) \u2014 or distributed on a labeled corpus.
  *
  * The classifier itself is [[graft.functions.expressions.CtLangId]]: the
  * trained profiles ride inside the expression, so corpus scoring is a
  * zero-shuffle codegen'd scan projection (the same inline-model shape as
  * BPE's merge table and the pruned unigram LM). The stopword heuristic
  * ([[Analyses.langIdHeuristic]]) stays as the cheap path.
  */
object LangId {

  /** Embedded training seeds \u2014 original sentences authored for this
    * library (everyday topics so common function words and char patterns
    * dominate), lowercase, BMP-only. Unicode-escaped in this source and
    * `chr(n)` in the DuckDB oracle so both engines parse identical text.
    */
  val seeds: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog while the children watch from the garden. every morning she walks to the market and buys fresh bread with butter and honey. knowledge of a language comes from reading many books and from speaking with other people. the weather today is cold but the sun shines through the clouds over the mountains. this is the house where the family lives together and shares food at the table. what time does the train leave for the city in the evening when the work is finished.",
    "de" -> "der schnelle braune fuchs springt \u00fcber den faulen hund w\u00e4hrend die kinder aus dem garten zuschauen. jeden morgen geht sie zum markt und kauft frisches brot mit butter und honig. die kenntnis einer sprache kommt vom lesen vieler b\u00fccher und vom sprechen mit anderen menschen. das wetter ist heute kalt aber die sonne scheint durch die wolken \u00fcber den bergen. dies ist das haus in dem die familie zusammen wohnt und das essen am tisch teilt. um wie viel uhr f\u00e4hrt der zug am abend in die stadt wenn die arbeit beendet ist.",
    "es" -> "el r\u00e1pido zorro marr\u00f3n salta sobre el perro perezoso mientras los ni\u00f1os miran desde el jard\u00edn. cada ma\u00f1ana ella camina al mercado y compra pan fresco con mantequilla y miel. el conocimiento de una lengua viene de leer muchos libros y de hablar con otras personas. el tiempo hoy es fr\u00edo pero el sol brilla entre las nubes sobre las monta\u00f1as. esta es la casa donde la familia vive junta y comparte la comida en la mesa. a qu\u00e9 hora sale el tren para la ciudad por la tarde cuando el trabajo termina.",
    "fr" -> "le rapide renard brun saute par dessus le chien paresseux pendant que les enfants regardent depuis le jardin. chaque matin elle marche au march\u00e9 et ach\u00e8te du pain frais avec du beurre et du miel. la connaissance d'une langue vient de la lecture de nombreux livres et de la conversation avec d'autres personnes. le temps aujourd'hui est froid mais le soleil brille \u00e0 travers les nuages au dessus des montagnes. c'est la maison o\u00f9 la famille vit ensemble et partage la nourriture \u00e0 table. \u00e0 quelle heure part le train pour la ville le soir quand le travail est termin\u00e9.",
    "it" -> "la rapida volpe marrone salta sopra il cane pigro mentre i bambini guardano dal giardino. ogni mattina lei cammina al mercato e compra pane fresco con burro e miele. la conoscenza di una lingua viene dalla lettura di molti libri e dal parlare con altre persone. il tempo oggi \u00e8 freddo ma il sole splende tra le nuvole sopra le montagne. questa \u00e8 la casa dove la famiglia vive insieme e condivide il cibo a tavola. a che ora parte il treno per la citt\u00e0 la sera quando il lavoro \u00e8 finito.",
    "pt" -> "a r\u00e1pida raposa marrom salta sobre o c\u00e3o pregui\u00e7oso enquanto as crian\u00e7as observam do jardim. cada manh\u00e3 ela caminha ao mercado e compra p\u00e3o fresco com manteiga e mel. o conhecimento de uma l\u00edngua vem da leitura de muitos livros e de falar com outras pessoas. o tempo hoje est\u00e1 frio mas o sol brilha entre as nuvens sobre as montanhas. esta \u00e9 a casa onde a fam\u00edlia vive junta e compartilha a comida na mesa. a que horas sai o trem para a cidade \u00e0 noite quando o trabalho termina.",
    "nl" -> "de snelle bruine vos springt over de luie hond terwijl de kinderen vanuit de tuin toekijken. elke ochtend loopt zij naar de markt en koopt vers brood met boter en honing. de kennis van een taal komt van het lezen van veel boeken en van het spreken met andere mensen. het weer is vandaag koud maar de zon schijnt door de wolken boven de bergen. dit is het huis waar het gezin samen woont en het eten aan tafel deelt. hoe laat vertrekt de trein naar de stad in de avond als het werk klaar is.",
    "zh" -> "\u654f\u6377\u7684\u68d5\u8272\u72d0\u72f8\u8df3\u8fc7\u61d2\u60f0\u7684\u72d7\u5b69\u5b50\u4eec\u5728\u82b1\u56ed\u91cc\u89c2\u770b\u3002\u6bcf\u5929\u65e9\u6668\u5979\u8d70\u5230\u5e02\u573a\u4e70\u65b0\u9c9c\u7684\u9762\u5305\u9ec4\u6cb9\u548c\u8702\u871c\u3002\u8bed\u8a00\u7684\u77e5\u8bc6\u6765\u81ea\u9605\u8bfb\u8bb8\u591a\u4e66\u7c4d\u548c\u4e0e\u5176\u4ed6\u4eba\u4ea4\u8c08\u3002\u4eca\u5929\u5929\u6c14\u5f88\u51b7\u4f46\u662f\u592a\u9633\u900f\u8fc7\u4e91\u5c42\u7167\u5728\u5c71\u4e0a\u3002\u8fd9\u662f\u4e00\u6240\u623f\u5b50\u5bb6\u4eba\u4f4f\u5728\u4e00\u8d77\u5728\u684c\u5b50\u4e0a\u5206\u4eab\u98df\u7269\u3002\u665a\u4e0a\u5de5\u4f5c\u7ed3\u675f\u540e\u706b\u8f66\u4ec0\u4e48\u65f6\u5019\u5f00\u5f80\u57ce\u5e02\u3002"
  )

  /** Train a profile per language from (lang, text) seed pairs \u2014 pure JVM,
    * runs at plan-construction time (seeds are KBs, not data).
    */
  def ctProfiles(seedTexts: Seq[(String, String)] = seeds,
                 topK: Int = CtKernel.DefaultTopK): Seq[(String, Seq[String])] =
    seedTexts.map { case (lang, text) =>
      lang -> CtKernel.profile(text, topK).toSeq
    }

  /** Distributed profile training on a lang-labeled corpus: char-gram
    * histogram per language (one explode + partial agg), per-language rank
    * window over the aggregated vocab, top-K collected to the driver
    * (K \u00d7 |langs| rows \u2014 bounded by the parameter, not the data).
    */
  def trainProfiles(df: DataFrame, textCol: String, langCol: String,
                    topK: Int = CtKernel.DefaultTopK): Seq[(String, Seq[String])] = {
    import org.apache.spark.sql.expressions.Window
    val g = explode(charGrams(col(textCol))).as("g")
    df.select(col(langCol).as("__lang"), g)
      .groupBy("__lang", "g").agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(
        Window.partitionBy("__lang").orderBy(col("c").desc, col("g").asc)))
      .where(col("r") <= topK)
      .groupBy("__lang").agg(sort_array(collect_list(struct(col("r"), col("g")))).as("gs"))
      .collect()
      .map(row => row.getString(0) ->
        row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1)))
      .sortBy(_._1).toSeq
  }

  /** All padded CT char n-grams of a document as array<string> (with
    * duplicates \u2014 counts matter), for distributed training. Built from
    * stock expressions so it mirrors [[CtKernel.grams]] exactly.
    */
  def charGrams(text: Column): Column = {
    val words = filter(split(lower(text), "[^\\p{L}]+"), w => length(w) > 0)
    flatten(transform(words, w => {
      val pw = concat(lit("_"), w, lit("_"))
      // sequence(1, stop) with stop < 1 generates a DESCENDING [1, 0] in
      // Spark — guard short words to an empty gram list instead
      flatten(transform(sequence(lit(1), lit(CtKernel.MaxN)), n =>
        when(length(pw) - n + 1 >= 1,
          transform(sequence(lit(1), length(pw) - n + 1),
            i => substring(pw, i, n)))
        .otherwise(array().cast("array<string>"))))
    }))
  }

  /** Predicted language code for a text column under trained profiles. */
  def langIdModel(text: Column,
                  profiles: Seq[(String, Seq[String])],
                  topK: Int = CtKernel.DefaultTopK): Column =
    Bridge.column(CtLangId(Bridge.expression(text), profiles, topK))

  /** (label, predicted, count) confusion counts over a labeled corpus. */
  def confusion(df: DataFrame, textCol: String, labelCol: String,
                profiles: Seq[(String, Seq[String])],
                topK: Int = CtKernel.DefaultTopK): DataFrame =
    df.select(col(labelCol).as("lang"),
        langIdModel(col(textCol), profiles, topK).as("pred"))
      .groupBy("lang", "pred").agg(count(lit(1)).as("cnt"))

  /** Predicted-language histogram (the P6 shape, model path). */
  def langIdModelCounts(df: DataFrame, textCol: String,
                        profiles: Seq[(String, Seq[String])],
                        topK: Int = CtKernel.DefaultTopK): DataFrame =
    df.select(langIdModel(col(textCol), profiles, topK).as("pred"))
      .groupBy("pred").agg(count(lit(1)).as("cnt"))
}
