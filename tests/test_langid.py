"""Trained language ID (operators/langid.py — Cavnar-Trenkle rank
profiles): held-out accuracy on a real multilingual corpus, profile
determinism, scoring-math exactness on a hand-computable case, and
the broadcast plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.langid import char_ngram_profiles, classify_lang

CORPUS = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she said that they would arrive before the meeting started today",
        "a government report shows that the weather will be cold this week",
        "children often read books about history and science in the library",
        "there is nothing better than a long walk through the quiet forest",
        "he could not remember where he had left the keys to the front door",
        "many people believe that learning another language takes a long time",
        "the teacher asked every student to write a short story about summer",
        "we should think carefully about what the right answer could be",
        "the old house at the end of the street was painted white last year",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund am fluss",
        "sie sagte dass sie vor dem beginn der besprechung ankommen würden",
        "ein bericht der regierung zeigt dass das wetter diese woche kalt wird",
        "kinder lesen oft bücher über geschichte und wissenschaft in der bibliothek",
        "es gibt nichts besseres als einen langen spaziergang durch den stillen wald",
        "er konnte sich nicht erinnern wo er die schlüssel gelassen hatte",
        "viele menschen glauben dass das lernen einer sprache lange dauert",
        "die lehrerin bat jeden schüler eine kurze geschichte zu schreiben",
        "wir sollten sorgfältig darüber nachdenken was die richtige antwort ist",
        "das alte haus am ende der straße wurde letztes jahr weiß gestrichen",
    ],
    "fr": [
        "le renard brun rapide saute par dessus le chien paresseux près de la rivière",
        "elle a dit qu ils arriveraient avant le début de la réunion aujourd hui",
        "un rapport du gouvernement montre que le temps sera froid cette semaine",
        "les enfants lisent souvent des livres d histoire et de science à la bibliothèque",
        "il n y a rien de mieux qu une longue promenade dans la forêt calme",
        "il ne se souvenait plus où il avait laissé les clés de la porte",
        "beaucoup de gens pensent qu apprendre une langue prend du temps",
        "le professeur a demandé à chaque élève d écrire une petite histoire",
        "nous devrions réfléchir soigneusement à la bonne réponse possible",
        "la vieille maison au bout de la rue a été peinte en blanc l année dernière",
    ],
    "es": [
        "el rápido zorro marrón salta sobre el perro perezoso junto al río",
        "ella dijo que llegarían antes de que empezara la reunión de hoy",
        "un informe del gobierno muestra que el clima será frío esta semana",
        "los niños leen a menudo libros de historia y ciencia en la biblioteca",
        "no hay nada mejor que un largo paseo por el bosque tranquilo",
        "no podía recordar dónde había dejado las llaves de la puerta",
        "mucha gente cree que aprender otro idioma lleva mucho tiempo",
        "la profesora pidió a cada estudiante que escribiera un cuento corto",
        "deberíamos pensar con cuidado cuál podría ser la respuesta correcta",
        "la casa vieja al final de la calle fue pintada de blanco el año pasado",
    ],
}


@pytest.fixture(scope="module")
def fitted(spark):
    train_rows, test_rows = [], []
    for lang, sents in CORPUS.items():
        for i, s in enumerate(sents):
            (test_rows if i >= 8 else train_rows).append((f"{lang}{i}", lang, s))
    train = spark.createDataFrame(train_rows, "id string, lang string, text string")
    test = spark.createDataFrame(test_rows, "id string, lang string, text string")
    prof = char_ngram_profiles(train, "text", "lang", 4, 400).localCheckpoint()
    return prof, train, test


def test_heldout_accuracy_and_train_fit(spark, fitted):
    prof, train, test = fitted
    got = {
        r["id"]: r["lang"]
        for r in classify_lang(test, "text", "id", prof, 4, 400).collect()
    }
    want = {r["id"]: r["lang"] for r in test.collect()}
    assert got == want  # 8/8 held-out sentences
    # training sentences classify to their own language too
    got_tr = {
        r["id"]: r["lang"]
        for r in classify_lang(train, "text", "id", prof, 4, 400).collect()
    }
    assert got_tr == {r["id"]: r["lang"] for r in train.collect()}


def test_profiles_deterministic_and_shaped(spark, fitted):
    prof, train, _ = fitted
    again = char_ngram_profiles(train.repartition(13), "text", "lang", 4, 400)
    assert {tuple(r) for r in prof.collect()} == {tuple(r) for r in again.collect()}
    sizes = {r["label"]: r["n"] for r in prof.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(CORPUS)
    assert all(n <= 400 for n in sizes.values())
    # ranks are 1..n contiguous per label
    mx = {r["label"]: r["m"] for r in prof.groupBy("label").agg(F.max("rank").alias("m")).collect()}
    assert mx == sizes


def test_out_of_place_math_hand_case(spark):
    """Tiny case small enough to verify the arithmetic by hand: one
    language whose profile is exactly the doc's grams in the same
    order → distance 0; a second language sharing nothing → every doc
    gram pays the max penalty."""
    train = spark.createDataFrame(
        [("a", "aa aa ab", ), ("b", "zz zy zz",)], ["lang", "text"]
    ).select(F.col("lang"), F.col("text"))
    prof = char_ngram_profiles(train, "text", "lang", 2, 50)
    doc = spark.createDataFrame([("d1", "aa aa ab")], "id string, text string")
    out = classify_lang(doc, "text", "id", prof, 2, 50).collect()[0]
    assert out["lang"] == "a" and out["distance"] == 0
    # and the same doc scored against ONLY the disjoint language pays
    # max penalty per gram (structural floor, not zero)
    only_b = prof.where("label = 'b'")
    far = classify_lang(doc, "text", "id", only_b, 2, 50).collect()[0]
    n_doc_grams = doc.select(
        F.explode(
            __import__("fenix_spark.operators.langid", fromlist=["_char_grams"])._char_grams(
                F.col("text"), 2
            )
        ).alias("g")
    ).where("g != ''").distinct().count()
    assert far["lang"] == "b" and far["distance"] >= 50 * (n_doc_grams - prof.where("label='b'").count())


def test_classify_plan_broadcasts_profiles(spark, fitted):
    prof, _, test = fitted
    df = classify_lang(test, "text", "id", prof, 4, 400)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
