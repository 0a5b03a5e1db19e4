"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Everything is a pure Column expression over ``spark.range(n)`` —
generation is fully distributed, JVM-side, and **independent of partition
count** (every value is a deterministic function of the row id via
xxhash64), so the same ``n`` yields byte-identical rows at local[8] and
local[32], which the scaling benchmark and resume tests rely on.

Planted failure classes (FIXTURES.md §1), one per rule family, chosen by
``id % 20``:

    0  → NULL text                (NOT_NULL)
    1  → too-short doc            (LENGTH / Gopher min_words)
    2  → symbol junk              (Gopher symbol_ratio, PERPLEXITY)
    3  → boilerplate repetition   (Gopher distinct-token ratio)
    4  → German text              (LANG_ID)
    5  → French text              (LANG_ID)
    6  → PII-laden English        (PII_SCRUB; still kept, but scrubbed)
    7  → toxic English            (PII_SCRUB scrub)
    8+ → clean English prose      (passes everything)

Domain skew is deliberate (~40% of rows on one domain) to exercise the
salted two-stage aggregation path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: distinct sentence pool for clean prose (original text, written for this
#: repo; each ~12 words, high stopword density, low symbol ratio).
_SENTENCES = [
    "the old harbor was quiet in the morning and the boats rested on the water",
    "she walked along the shore and watched the light change over the hills",
    "a small market opened near the square where people traded bread and fruit",
    "the train moved slowly through the valley and past the stone bridges",
    "he kept a notebook of the things that he saw on the road each day",
    "rain fell softly on the roof while the kettle warmed on the stove",
    "the library stayed open late and the lamps glowed over the long tables",
    "children played in the park until the evening bell called them home",
    "a letter arrived from the north with news of the coming festival",
    "the garden grew wild at the edges but the paths were kept clear",
    "they repaired the mill wheel after the flood and the village cheered",
    "the baker set out warm loaves as the first customers came through the door",
    "snow settled on the pines and the trail turned white before noon",
    "an old map showed a route over the pass that few had ever taken",
    "the choir practiced in the hall and the sound carried into the street",
    "a merchant told stories of distant ports while the fire burned low",
]

_GERMAN = (
    "der alte hafen war ruhig und die boote lagen still auf dem wasser "
    "sie ging am ufer entlang und das licht wechselte über den hügeln "
    "ein kleiner markt öffnete am platz und die leute kauften brot und obst "
    "der zug fuhr langsam durch das tal und über die alten brücken "
    "es war nicht spät und die lampen brannten noch in der halle "
    "ein brief kam aus dem norden mit nachrichten von dem fest "
    "der garten wuchs wild aber die wege waren frei und eine glocke rief die kinder nach hause"
)

_FRENCH = (
    "le vieux port était calme le matin et les bateaux se reposaient sur l'eau "
    "elle marchait le long du rivage et la lumière changeait sur les collines "
    "un petit marché ouvrait près de la place où les gens achetaient du pain "
    "le train roulait lentement dans la vallée et sur les vieux ponts "
    "une lettre est arrivée du nord avec des nouvelles de la fête "
    "le jardin poussait sauvage mais les chemins restaient clairs pour vous et pour nous "
    "les enfants jouaient dans le parc et la cloche les appelait dans la maison"
)

_PII_DOC = (
    "please contact our support team at help.desk@example-mail.com for any question "
    "about the order and the delivery of the package to your home address "
    "you can also call 555-123-4567 during the week or write to the office "
    "the billing record under 123-45-6789 was moved to the new server at 192.168.10.25 "
    "and the team will answer with the details of the account and the invoice "
    "we thank you for the patience and the trust that you place in the service "
    "our staff reads every message that arrives and sends a reply on the same day "
    "when the answer takes longer than a week the case is raised with the manager "
    "and the customer receives a note with the state of the request and the date"
)

_TOXIC_DOC = (
    "the forum thread turned sour when one user wrote badword again and again "
    "and the moderators removed the post for the language that it contained "
    "most of the readers agreed that the rules of the board were fair and clear "
    "and the discussion returned to the topic of the match and the season "
    "a few members still felt that the warning was too mild for a curseword "
    "but the thread stayed open and the tone improved over the following days"
)

_BOILER = "click here to subscribe to the newsletter "

_JUNK = "@#$%^&* ()_+ {}[]<> ~`|\\ ;;;; ==== #### $$$$ %%%% ^^^^ &&&& "


def _pick_sentences(id_col: Column, n_min: int = 6, n_spread: int = 6) -> Column:
    """Concatenate a rotating window of the sentence pool — every doc gets
    ``n_min + (id % n_spread)`` consecutive-mod-16 distinct sentences."""
    arr = F.array(*[F.lit(s) for s in _SENTENCES])
    off = F.pmod(F.xxhash64(id_col, F.lit(7)), F.lit(len(_SENTENCES)))
    k = F.lit(n_min) + F.pmod(id_col, F.lit(n_spread))
    pieces = [
        F.when(
            F.lit(j) < k,
            F.element_at(arr, (F.pmod(off + F.lit(j), F.lit(len(_SENTENCES))) + 1)
                         .cast("int")),
        ).otherwise(F.lit(None))
        for j in range(n_min + n_spread)
    ]
    return F.concat_ws(" ", *pieces)


def synthesize_pages(spark: SparkSession, n: int,
                     partitions: int | None = None) -> DataFrame:
    """Deterministic pages table of ``n`` rows (seed folded into xxhash64)."""
    df = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    i = F.col("id")
    cls = F.pmod(i, F.lit(20))

    clean = _pick_sentences(i)
    text = (
        F.when(cls == 0, F.lit(None).cast("string"))
        .when(cls == 1, F.lit("too short to keep"))
        .when(cls == 2, F.concat(F.lit("page not found "), F.lit(_JUNK * 4)))
        .when(cls == 3, F.lit(_BOILER * 40))
        .when(cls == 4, F.lit(_GERMAN))
        .when(cls == 5, F.lit(_FRENCH))
        .when(cls == 6, F.lit(_PII_DOC))
        .when(cls == 7, F.lit(_TOXIC_DOC))
        .otherwise(clean)
    )

    # rare planted duplicate urls (UNIQUE rule): id%997==1 reuses id-1's
    # whole url (domain AND path derive from the shifted base id)
    base = F.when((F.pmod(i, F.lit(997)) == 1) & (i > 0), i - 1).otherwise(i)
    # skewed domains: ~40% on one portal (exercises salting)
    dhash = F.pmod(F.xxhash64(base, F.lit(11)), F.lit(100))
    domain = (
        F.when(dhash < 40, F.lit("big-portal.example.com"))
        .when(dhash < 60, F.lit("news.example.org"))
        .when(dhash < 75, F.lit("blog.example.net"))
        .otherwise(F.concat(F.lit("site-"),
                            F.pmod(F.xxhash64(base, F.lit(13)), F.lit(500)),
                            F.lit(".example.com")))
    )
    url = F.concat(F.lit("https://"), domain, F.lit("/page/"), base)

    # source-claimed language, sometimes wrong (id%37==0 → bogus 'xx')
    true_lang = (
        F.when(cls == 4, F.lit("de"))
        .when(cls == 5, F.lit("fr"))
        .otherwise(F.lit("en"))
    )
    lang = F.when(F.pmod(i, F.lit(37)) == 0, F.lit("xx")).otherwise(true_lang)

    warc_ts = F.timestamp_seconds(
        F.lit(1704067200) + F.pmod(F.xxhash64(i, F.lit(17)), F.lit(30 * 86400)))

    # text is ESCAPED into the markup (as any real page would be) so
    # html → text extraction can be verified byte-identical per url
    # (functions/extraction.py; the north-rule invariant). & first so
    # the entity ampersands themselves never double-escape.
    escaped = F.replace(
        F.replace(
            F.replace(F.coalesce(text, F.lit("")),
                      F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;")),
        F.lit(">"), F.lit("&gt;"))
    html = F.encode(
        F.concat(F.lit("<html><body><p>"), escaped,
                 F.lit("</p></body></html>")),
        "UTF-8",
    )

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
