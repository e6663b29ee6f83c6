package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token stats on a known sentence") {
    val df = Seq("The quick fox the fox").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount($"text").as("n"),
      size(TextAnalysis.tokenSet($"text")).as("u"),
      TextAnalysis.meanTokenLength($"text").as("m"))
      .as[(Int, Int, Double)].head()
    assert(r._1 == 5 && r._2 == 3) // {the, quick, fox}
    assert(r._3 == 3.4)            // 17 non-space chars / 5 tokens
  }

  test("stopword and punct ratios") {
    val df = Seq("the cat, the hat!").toDF("text")
    val r = df.select(
      TextAnalysis.stopwordRatio($"text").as("s"),
      TextAnalysis.punctRatio($"text").as("p"))
      .as[(Double, Double)].head()
    assert(r._1 == 0.5)       // 2 of 4 tokens are "the"
    assert(r._2 == 0.117647)  // 2 punct chars / 17
  }

  test("langId picks the dominant marker profile, und when all zero") {
    val df = Seq(
      ("a", "thth hehe ngng"),   // en markers only
      ("b", "erer chch eiei"),   // de markers only
      ("c", "zz qq xx")          // no markers
    ).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langId($"text")).as[(String, String)]
      .collect().toMap
    assert(got("a") == "en" && got("b") == "de" && got("c") == "und")
  }

  test("fingerprint is order- and repetition-invariant") {
    val df = Seq(("x", "alpha beta gamma"), ("y", "gamma beta alpha alpha"))
      .toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("maskPii masks emails, URLs, IPs, and phones; leaves prose alone") {
    val df = Seq(
      ("e", "mail me at jane.doe+spam@corp.example.org today"),
      ("u", "see https://example.com/a?b=c#d and more"),
      ("uem", "profile http://ex.com/u/bob@corp.com trailing"), // @ inside URL -> URL
      ("ip", "server at 192.168.0.1 responded"),
      ("ph", "call +1 555-0100 now"),
      ("clean", "no personal data in this sentence")
    ).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.maskPii($"text")).as[(String, String)]
      .collect().toMap
    assert(got("e") == "mail me at <EMAIL> today")
    assert(got("u") == "see <URL> and more")
    assert(got("uem") == "profile <URL> trailing")
    assert(got("ip") == "server at <IP> responded")
    assert(got("ph") == "call <PHONE> now")
    assert(got("clean") == "no personal data in this sentence")
  }

  test("corpusFilter applies the C4/Gopher rule set") {
    val stop = "the a of to in" // guaranteed stopword content
    val df = Seq(
      ("keep", s"$stop one two three four five six seven eight nine ten " +
        s"alpha beta gamma delta epsilon"),               // 20 tokens, clean
      ("short", "too short"),                             // fails minTokens
      ("nostop", "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"), // no stopwords
      ("noisy", s"$stop @@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) {{{{ " +
        "}}}} [[[[ ]]]] ;;;; :::: '''' \"\"\"\" <<<< >>>>")  // punct ceiling
    ).toDF("id", "text")
    val kept = TextAnalysis.corpusFilter(df, minTokens = 15, maxTokens = 100,
      minMeanTokLen = 1.0, maxMeanTokLen = 10.0,
      maxPunctRatio = 0.2, minStopwordRatio = 0.05)
      .select("id").as[String].collect().toSet
    assert(kept == Set("keep"))
  }

  test("repetitionStats computes top token/bigram shares") {
    val df = Seq(
      (1L, "spam spam spam ham"),   // top token 3/4; top bigram "spam spam" 2/3
      (2L, "one two three four"),   // all shares 1/n
      (3L, "solo")                  // < 2 tokens -> null bigram share
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(1L) == (0.75, Some(0.666667)))
    assert(got(2L) == (0.25, Some(0.333333)))
    assert(got(3L) == (1.0, None))
  }

  test("unigramLogProb scores common-token docs higher than rare-token docs") {
    val df = Seq(
      (1L, "common common common common"),
      (2L, "common common rare1 rare2")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(df, "doc_id")
      .as[(Long, Double)].collect().toMap
    // p(common)=6/8, p(rare)=1/8; doc 1 all-common scores higher
    assert(got(1L) > got(2L))
    assert(math.abs(got(1L) - math.round(math.log(6.0 / 8.0) * 1e6) / 1e6) < 1e-6)
  }

  test("qualityScore bounded in [0,1] and favors clean prose") {
    val df = Seq(
      ("clean", "the cat sat on the mat and it is a fine day for all of us", 400L),
      ("noisy", "@@## $$%% ^^&& ||~~ ``{{", 24L)
    ).toDF("id", "text", "n_chars")
    val got = df.select($"id",
      TextAnalysis.qualityScore($"text", $"n_chars")).as[(String, Double)]
      .collect().toMap
    assert(got.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(got("clean") > got("noisy"))
  }
}
