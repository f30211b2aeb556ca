"""Conformance corpora — transcriptions of the reference test inputs.

Doc tuples are (title, text, url, rank) in reference add order (row order =
add order; pageId assignment replays insertion order,
memory-storage.ts:101-106). Sources: engine.test.ts:4-58 (planets),
:137-208 (carl friedrich), :233-285 (haber), :302-325 (star), and
engine-binary.test.ts:10-114 (carl friedrich with per-row ranks).

``pages_table`` wraps a corpus into the BASELINE.json ``input_hint`` shape
(url, warc_ts, html, text, lang) + the conformance side columns
(title/rank/add_order) so the Ray build pipeline consumes the same schema it
would see on a Common-Crawl-style crawl.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

from search_engine_ray.config import EngineConfig, ScoreWeights

Doc = tuple[str, str, str, int]  # (title, text, url, rank)

JUPITER_TEXT = (
    "Jupiter is the fifth planet from the Sun and the largest in the \n"
    "      Solar System. It is a gas giant with a mass one-thousandth that of the Sun, \n"
    "      but two-and-a-half times that of all the other planets in the Solar System \n"
    "      combined. Jupiter is one of the brightest objects visible to the naked eye \n"
    "      in the night sky, and has been known to ancient civilizations since before \n"
    "      recorded history. It is named after the Roman god Jupiter.[18] When viewed \n"
    "      from Earth, Jupiter can be bright enough for its reflected light to cast \n"
    "      visible shadows,[19] and is on average the third-brightest natural object \n"
    "      in the night sky after the Moon and Venus."
)

SATURN_TEXT = (
    "Saturn is the sixth planet from the Sun and the second-largest in the \n"
    "        Solar System, after Jupiter. It is a gas giant with an average radius \n"
    "        of about nine times that of Earth.[18][19] It only has one-eighth the \n"
    "        average density of Earth; however, with its larger volume, Saturn is \n"
    "        over 95 times more massive.[20][21][22] Saturn is named after the Roman \n"
    "        god of wealth and agriculture; its astronomical symbol (♄) represents \n"
    "        the god´s sickle."
)

PLANETS: list[Doc] = [
    ("Jupiter", JUPITER_TEXT, "https://en.wikipedia.org/wiki/Jupiter", 0),
    ("Saturn", SATURN_TEXT, "https://en.wikipedia.org/wiki/Saturn", 1),
]

_CF_PAGES: list[tuple[str, str]] = [
    ("generalized by Friedrich Bessel are", "https://en.wikipedia.org/wiki/Bessel_function"),
    ("upon by Friedrich Hayek", "https://en.wikipedia.org/wiki/Economic_calculation_problem"),
    ("V or Friedrich V may", "https://en.wikipedia.org/wiki/Frederick_V"),
    (
        "other deities Friedrich Schelling 1775 ... word and Friedrich Welcker 1784",
        "https://en.wikipedia.org/wiki/Henotheism",
    ),
    ("Johann Friedrich Agricola 4", "https://en.wikipedia.org/wiki/Johann_Friedrich_Agricola"),
    ("Johann Friedrich Endersch 25", "https://en.wikipedia.org/wiki/Johann_Friedrich_Endersch"),
    ("by Carl Friedrich Gauss in", "https://en.wikipedia.org/wiki/Modular_arithmetic"),
    (
        "and mineralogist Friedrich Mohs it",
        "https://en.wikipedia.org/wiki/Mohs_scale_of_mineral_hardness",
    ),
    ("mathematician Carl Friedrich Gauss 1777", "https://en.wikipedia.org/wiki/Number_theory"),
    (
        "Georg Wilhelm Friedrich Hegel 1770 ... 1831 and Friedrich Wilhelm Joseph",
        "https://en.wikipedia.org/wiki/Panentheism",
    ),
    (
        "Marx and Friedrich Engels Commissioned",
        "https://en.wikipedia.org/wiki/The_Communist_Manifesto",
    ),
    (
        "also spelled Carl Friedrich Bahrdt was ... an unorthodox German Protestant "
        "biblical ... characters in German learning",
        "https://en.wikipedia.org/wiki/Karl_Friedrich_Bahrdt",
    ),
    (
        "Franz Ludwig Carl Friedrich Passow September ... was a German classical scholar",
        "https://en.wikipedia.org/wiki/Franz_Passow",
    ),
    (
        "Geologist Carl Friedrich Christian Mohs ... was a German geologist and",
        "https://en.wikipedia.org/wiki/Friedrich_Mohs",
    ),
    ("of Johann Friedrich Meckel after", "https://en.wikipedia.org/wiki/Recapitulation_theory"),
    (
        'German mathematician "CARL FrieDricH" Gauss Richard',
        "https://en.wikipedia.org/wiki/G._Waldo_Dunnington",
    ),
]

# engine.test.ts:210-221 — title = url with FIRST '_' -> ' '; rank = i + 1
CARL_FRIEDRICH: list[Doc] = [
    (url.replace("_", " ", 1), text, url, i + 1)
    for i, (text, url) in enumerate(_CF_PAGES)
]

# engine-binary.test.ts:10-114 — same corpus except row 12 (Carl_Friedrich_Gauss,
# rank 10); all others rank 100; rank argument = rank + i.
_CF_BIN_PAGES: list[tuple[str, str, int]] = [
    (t, u, 100) for (t, u) in _CF_PAGES[:12]
] + [
    (
        "Johann Carl Friedrich Gauss was a German mathematician and physicist who "
        "made significant contributions to many fields in mathematics and science.",
        "https://en.wikipedia.org/wiki/Carl_Friedrich_Gauss",
        10,
    )
] + [(t, u, 100) for (t, u) in _CF_PAGES[13:]]

CARL_FRIEDRICH_BINARY: list[Doc] = [
    (url.replace("_", " ", 1), text, url, rank + i)
    for i, (text, url, rank) in enumerate(_CF_BIN_PAGES)
]

PROCESS_TEXT = (
    "A process is series or set of activities that interact to \n"
    "      produce a result; it may occur once-only or be recurrent \n"
    "      or periodic."
)
HABER_PROCESS_TEXT = (
    "The Haber process,[1] also called the Haber–Bosch process, \n"
    "            is an artificial nitrogen fixation process and is the main \n"
    "            industrial procedure for the production of ammonia today."
)

HABER: list[Doc] = [
    ("Process", PROCESS_TEXT, "https://hackapedia.org/?id=12345", 0),
    ("Process", PROCESS_TEXT, "https://en.wikipedia.org/wiki/Process", 10),
    (
        "Haber",
        'Haber is a surname of German origin. The meaning in \n'
        '      old German is "oat". The cereal is now in German called "Hafer".\n'
        "      The process of making is ....",
        "https://en.wikipedia.org/wiki/Haber",
        10,
    ),
    ("Haber process", HABER_PROCESS_TEXT, "https://hackapedia.org/?id=4567&title=Haber", 10),
    ("Haber process", HABER_PROCESS_TEXT, "https://en.wikipedia.org/wiki/Haber_process", 10),
]

HABER_WEIGHTS = ScoreWeights(
    title_exact_match=10.0,
    title_begins=5.0,
    title_contains_in_beginning=1.0,
    url_contains=1.0,
)

STAR: list[Doc] = [
    (
        "Technology in Star Trek",
        "The technology in Star Trek has borrowed many ideas from the scientific "
        "world. Episodes often contain technologies named after real-world scientific "
        "phenomena, such as tachyon beams, baryon sweeps, quantum slipstream drives, "
        "and photon torpedoes. Some of the technologies created for the Star Trek "
        "universe were done so out of financial necessity. For instance, the "
        "transporter was created because the limited budget of Star Trek: The "
        "Original Series (TOS) in the 1960s did not allow expensive shots of "
        "spaceships landing on planets.[1][page needed]",
        "https://en.wikipedia.org/wiki/Technology_in_Star_Trek",
        100000,
    ),
    (
        "Star Trek: The Original Series",
        "Star Trek is an American science-fiction television series created by Gene "
        "Roddenberry that follows the adventures of the starship USS Enterprise "
        "(NCC-1701) and its crew. It later acquired the retronym of Star Trek: The "
        "Original Series (TOS) to distinguish the show within the media franchise "
        "that it began.",
        "https://en.wikipedia.org/wiki/Star_Trek:_The_Original_Series",
        1000,
    ),
    (
        "Star",
        "A star is an astronomical object consisting of a luminous spheroid of "
        "plasma held together by its own gravity. The nearest star to Earth is the "
        "Sun. Many other stars are visible to the naked eye from Earth during the "
        "night, appearing as a multitude of fixed luminous points in the sky due to "
        "their immense distance from Earth. Historically, the most prominent stars "
        "were grouped into constellations and asterisms, the brightest of which "
        "gained proper names. Astronomers have assembled star catalogues that "
        "identify the known stars and provide standardized stellar designations. "
        "The observable Universe contains an estimated 1×1024 stars,[1][2] but "
        "most are invisible to the naked eye from Earth, including all stars "
        "outside our galaxy, the Milky Way.",
        "https://en.wikipedia.org/wiki/Star",
        10,
    ),
]

CORPORA: dict[str, tuple[list[Doc], EngineConfig]] = {
    "planets": (PLANETS, EngineConfig()),
    "carl_friedrich": (CARL_FRIEDRICH, EngineConfig()),
    "carl_friedrich_binary": (CARL_FRIEDRICH_BINARY, EngineConfig()),
    "haber": (HABER, EngineConfig(score_weights=HABER_WEIGHTS)),
    "star": (STAR, EngineConfig()),
}

_EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)


def wrap_html(title: str, text: str) -> bytes:
    """Deterministic HTML wrapper — exactly invertible so the extractor is
    byte-identical per url (FIXTURES.md §1)."""
    return f"<html><head><title>{title}</title></head><body>{text}</body></html>".encode(
        "utf-8"
    )


def pages_table(docs: list[Doc]) -> pa.Table:
    """Corpus -> input_hint-shaped Arrow table (+ conformance side columns)."""
    urls = [d[2] for d in docs]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [_EPOCH + _dt.timedelta(seconds=i) for i in range(len(docs))],
                pa.timestamp("us"),
            ),
            "html": pa.array([wrap_html(d[0], d[1]) for d in docs], pa.binary()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "rank": pa.array([d[3] for d in docs], pa.int64()),
            "add_order": pa.array(range(len(docs)), pa.int64()),
        }
    )
