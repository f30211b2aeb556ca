"""Golden conformance suite — 1:1 port of the reference jest expectations.

Sources: /root/reference/src/engine.test.ts (Planets :59-134, carl friedrich
:210-230, Rank Haber :286-299, Rank Star :326-343) and
engine-binary.test.ts:116-125. Runs against LocalEngine (the sequential
oracle); tests in test_build_ray.py assert the Ray-built index gives
identical results.
"""

import re

import pytest

from search_engine_ray.local_engine import LocalEngine
from search_engine_ray.sources.fixtures import CORPORA


def build(name: str) -> LocalEngine:
    docs, config = CORPORA[name]
    eng = LocalEngine(config)
    for title, text, url, rank in docs:
        eng.add(title, text, url, rank)
    return eng


@pytest.fixture(scope="module")
def planets():
    return build("planets")


@pytest.fixture(scope="module")
def haber():
    return build("haber")


@pytest.fixture(scope="module")
def star():
    return build("star")


class TestPlanets:
    def test_single_hit(self, planets):
        r = planets.search("brightest")
        assert len(r) == 1
        assert r[0].url == "https://en.wikipedia.org/wiki/Jupiter"
        assert 'of the "brightest" objects visible' in r[0].introduction
        assert 'the third "brightest" natural object' in r[0].introduction

    def test_two_results(self, planets):
        r = planets.search("giant")
        assert len(r) == 2
        assert r[0].url == "https://en.wikipedia.org/wiki/Jupiter"
        assert r[1].url == "https://en.wikipedia.org/wiki/Saturn"
        assert 'gas "giant"' in r[0].introduction
        assert 'gas "giant"' in r[1].introduction

    def test_multiple_hits(self, planets):
        assert len(planets.search("Solar")) == 2

    def test_single_adjacent_words(self, planets):
        r = planets.search("ancient civilizations")
        assert len(r) == 1
        assert r[0].url == "https://en.wikipedia.org/wiki/Jupiter"
        assert r[0].introduction == 'known to "ancient civilizations" since before'

    def test_single_words(self, planets):
        r = planets.search("planet sixth")
        assert len(r) == 1
        assert r[0].url == "https://en.wikipedia.org/wiki/Saturn"
        assert r[0].introduction == 'is the "sixth planet" from the'

    def test_quotes_no_matches(self, planets):
        assert len(planets.search('"planet sixth"')) == 0

    def test_quotes_one_match(self, planets):
        r = planets.search('"after Jupiter"')
        assert len(r) == 1
        assert r[0].url == "https://en.wikipedia.org/wiki/Saturn"
        assert "after Jupiter" in r[0].introduction

    def test_quotes_suffix_word(self, planets):
        r = planets.search('"from the Sun" Moon')
        assert len(r) == 1
        assert r[0].url == "https://en.wikipedia.org/wiki/Jupiter"
        assert re.search(r'"from the Sun".*?"Moon"', r[0].introduction)

    def test_quotes_prefix_word_after_incorrect_case(self, planets):
        r = planets.search('moon "from the Sun"')
        assert len(r) == 1
        assert r[0].url == "https://en.wikipedia.org/wiki/Jupiter"
        assert re.search(r'"from the Sun".*?"Moon"', r[0].introduction)

    def test_quotes_prefix_word_first_incorrect_case(self, planets):
        r = planets.search('fifth "from the sun"')
        assert len(r) == 1
        assert r[0].url == "https://en.wikipedia.org/wiki/Jupiter"
        assert re.search(r'"fifth".*"from the Sun"', r[0].introduction)

    def test_quotes_incorrect_case(self, planets):
        assert len(planets.search('"moon and venus"')) == 1


class TestCarlFriedrich:
    def test_should_work(self):
        eng = build("carl_friedrich")
        r = eng.search('"carl friedrich"')
        assert len(r) == 6
        assert 'by "Carl Friedrich" Gauss in' in r[0].introduction
        assert 'mathematician "Carl Friedrich" Gauss 1777' in r[1].introduction
        assert '"CARL FrieDricH"' in r[5].introduction

    def test_binary_ranks(self):
        eng = build("carl_friedrich_binary")
        r = eng.search('"carl friedrich"')
        assert len(r) == 6
        assert r[0].url == "https://en.wikipedia.org/wiki/Carl_Friedrich_Gauss"
        assert 'arithmetic by "Carl Friedrich" Gauss in' in r[1].introduction
        assert '"CARL FrieDricH"' in r[5].introduction


class TestRankHaber:
    def test_process(self, haber):
        r = haber.search("process")
        assert r[0].url == "https://en.wikipedia.org/wiki/Process"

    def test_haber(self, haber):
        r = haber.search("haber")
        assert r[0].url == "https://en.wikipedia.org/wiki/Haber"

    def test_haber_process(self, haber):
        r = haber.search("haber process")
        assert r[0].url == "https://en.wikipedia.org/wiki/Haber_process"


class TestRankStar:
    def test_star(self, star):
        r = star.search("star")
        assert r[0].url == "https://en.wikipedia.org/wiki/Star"

    def test_trek(self, star):
        r = star.search("trek")
        assert r[0].url == "https://en.wikipedia.org/wiki/Star_Trek:_The_Original_Series"

    def test_star_trek(self, star):
        r = star.search("star trek")
        assert r[0].url == "https://en.wikipedia.org/wiki/Star_Trek:_The_Original_Series"
