"""Train the char-trigram language-ID model fixture (VERDICT r8
stretch: replace the stopword heuristic with a small TRAINED model
shipped as a fixture, the q130 .onnx pattern).

Method (public: Cavnar & Trenkle 1994 n-gram categorization /
fastText-style char n-grams, multinomial NB scored as log-odds
against the unseen floor): per language, count character trigrams
over a small training corpus (written for this fixture — generic
everyday sentences, no copyrighted text), add-one smooth, keep each
language's top-K trigrams, store INTEGER scores

    score = round(100 * (log P(ng|lang) − log P_unseen(lang)))
          = round(100 * log(count + 1))

Centering against each language's own unseen-trigram floor is what
makes a missing (ngram, lang) pair contribute EXACTLY zero — so the
scorer can INNER-join and drop unmatched trigrams with no bias
(a raw log-prob sum would favor the language that matches FEWEST
trigrams: fewer negative terms). Integer scores make the distributed
sum exact, so Spark and the DuckDB oracle agree bit-for-bit and the
argmax is deterministic. This inner-join neutrality is the property
that lets the 100 TB plan be one explode + one broadcast join, no
left-join NULL handling.

Run: python tools/train_langid.py   (rewrites the committed fixture
odin_rs_spark/sources/fixtures/langid_trigrams.csv deterministically)
"""
from __future__ import annotations

import csv
import math
import os
from collections import Counter

# Small per-language training corpora: generic sentences in each
# language, written for this fixture. Word salads scoring is what the
# trigram profile captures — syntax does not matter, orthography does.
CORPORA: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and runs through the "
        "green fields every morning before the sun rises over the hills "
        "while children walk to school with their books and teachers "
        "prepare lessons about history science and the natural world "
        "people often say that reading is the best way to learn new things "
        "and that practice makes perfect when learning any language "
        "water flows down the river toward the sea where ships carry goods "
        "between distant countries and fishermen catch fish in the early light"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und läuft "
        "jeden morgen durch die grünen felder bevor die sonne über den "
        "hügeln aufgeht während die kinder mit ihren büchern zur schule "
        "gehen und die lehrer den unterricht über geschichte wissenschaft "
        "und die natürliche welt vorbereiten die leute sagen oft dass lesen "
        "der beste weg ist neue dinge zu lernen und dass übung den meister "
        "macht wenn man eine sprache lernt das wasser fließt den fluss "
        "hinunter zum meer wo schiffe waren zwischen fernen ländern tragen"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et court "
        "chaque matin à travers les champs verts avant que le soleil ne se "
        "lève sur les collines pendant que les enfants marchent vers "
        "l'école avec leurs livres et que les professeurs préparent des "
        "leçons sur l'histoire la science et le monde naturel les gens "
        "disent souvent que la lecture est la meilleure façon d'apprendre "
        "de nouvelles choses et que la pratique rend parfait quand on "
        "apprend une langue l'eau coule dans la rivière vers la mer où les "
        "navires transportent des marchandises entre des pays lointains"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y corre cada "
        "mañana por los campos verdes antes de que el sol salga sobre las "
        "colinas mientras los niños caminan a la escuela con sus libros y "
        "los maestros preparan lecciones sobre historia ciencia y el mundo "
        "natural la gente dice a menudo que leer es la mejor manera de "
        "aprender cosas nuevas y que la práctica hace al maestro cuando se "
        "aprende un idioma el agua fluye por el río hacia el mar donde los "
        "barcos llevan mercancías entre países lejanos y los pescadores"
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro e corre ogni "
        "mattina attraverso i campi verdi prima che il sole sorga sulle "
        "colline mentre i bambini camminano verso la scuola con i loro "
        "libri e gli insegnanti preparano lezioni di storia scienza e il "
        "mondo naturale la gente dice spesso che leggere è il modo "
        "migliore per imparare cose nuove e che la pratica rende perfetti "
        "quando si impara una lingua l'acqua scorre lungo il fiume verso "
        "il mare dove le navi trasportano merci tra paesi lontani"
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cachorro preguiçoso e corre "
        "todas as manhãs pelos campos verdes antes que o sol nasça sobre "
        "as colinas enquanto as crianças caminham para a escola com seus "
        "livros e os professores preparam lições sobre história ciência e "
        "o mundo natural as pessoas costumam dizer que ler é a melhor "
        "maneira de aprender coisas novas e que a prática leva à perfeição "
        "quando se aprende uma língua a água corre pelo rio em direção ao "
        "mar onde os navios transportam mercadorias entre países distantes"
    ),
}

TOP_K = 400


def trigrams(text: str):
    t = " " + " ".join(text.lower().split()) + " "
    for i in range(len(t) - 2):
        yield t[i : i + 3]


def main() -> None:
    rows: list[tuple[str, str, int]] = []
    for lang, corpus in sorted(CORPORA.items()):
        counts = Counter(trigrams(corpus))
        top = counts.most_common(TOP_K)
        for ng, c in sorted(top):
            # log-odds vs the unseen floor (see module docstring):
            # (c+1)/(total+vocab) over 1/(total+vocab) = c+1
            score = round(100.0 * math.log(c + 1))
            rows.append((ng, lang, score))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "odin_rs_spark", "sources", "fixtures", "langid_trigrams.csv",
    )
    with open(out, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f, quoting=csv.QUOTE_ALL)
        w.writerow(["ngram", "lang", "score"])
        for ng, lang, score in rows:
            w.writerow([ng, lang, score])
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
