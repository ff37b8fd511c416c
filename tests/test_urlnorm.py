"""Golden tests ported verbatim from the reference:

  - UrlCleanerTest.scala:15-106  (clean_url)
  - UrlFilterSpec.scala:15-60    (wanted_url)

plus validity / host / trailing-slash cases pinned by
ContentFilterSpec.scala and Supervisor.scala:221.
"""

import pandas as pd
import pytest

from spider_spark.functions.urlnorm import (
    clean_url,
    clean_url_series,
    is_valid_url,
    strip_trailing_slash,
    url_host,
    wanted_url,
)

CLEAN_CASES = [
    # nn param (UrlCleanerTest.scala:15-27)
    (
        "https://www.bmvi.de/SiteGlobals/Forms/Listen/EN/News-From-The-Ministry/News-From-The-Ministry_Formular.html?nn=260752&queryResultId=null&pageNo=0",
        "https://www.bmvi.de/SiteGlobals/Forms/Listen/EN/News-From-The-Ministry/News-From-The-Ministry_Formular.html?queryResultId=null&pageNo=0",
    ),
    # gtp param (UrlCleanerTest.scala:29-44)
    (
        "https://www.bmvi.de/SiteGlobals/Forms/Listen/EN/News-From-The-Ministry/News-From-The-Ministry_Formular.html?queryResultId=null&pageNo=0&gtp=14468_liste%3D55%26212490_list%3D44",
        "https://www.bmvi.de/SiteGlobals/Forms/Listen/EN/News-From-The-Ministry/News-From-The-Ministry_Formular.html?queryResultId=null&pageNo=0",
    ),
    (
        "https://www.bmvi.de/DE/Themen/Digitales/mFund/Projekte/mfund-projekte.html?gtp=325998_liste%253D3",
        "https://www.bmvi.de/DE/Themen/Digitales/mFund/Projekte/mfund-projekte.html",
    ),
    # fragment strip (UrlCleanerTest.scala:46-61)
    (
        "https://www.bmvi.de/SiteGlobals/Forms/Listen/EN/News-From-The-Ministry/News-From-The-Ministry_Formular.html?queryResultId=null&pageNo=0#servicenav",
        "https://www.bmvi.de/SiteGlobals/Forms/Listen/EN/News-From-The-Ministry/News-From-The-Ministry_Formular.html?queryResultId=null&pageNo=0",
    ),
    ("https://www.bmvi.de/DE/Home/home.html#main", "https://www.bmvi.de/DE/Home/home.html"),
    (
        "https://www.bmvi.de/SharedDocs/DE/Artikel/LF/drohnen.html?nn=12830#servicenav",
        "https://www.bmvi.de/SharedDocs/DE/Artikel/LF/drohnen.html",
    ),
    # imgdownload / download (UrlCleanerTest.scala:63-79)
    (
        "https://www.bmvi.de/SharedDocs/DE/Bilder/Pressefotos/Wasser/scheuer-uferpromenade.jpg?__blob=normal&imgdownload=true",
        "https://www.bmvi.de/SharedDocs/DE/Bilder/Pressefotos/Wasser/scheuer-uferpromenade.jpg?__blob=normal",
    ),
    (
        "https://www.bmvi.de/SharedDocs/DE/Bilder/Pressefotos/Wasser/scheuer-uferpromenade.jpg?__blob=normal&download=true",
        "https://www.bmvi.de/SharedDocs/DE/Bilder/Pressefotos/Wasser/scheuer-uferpromenade.jpg?__blob=normal",
    ),
    (
        "https://www.bundesregierung.de/resource/blob/974430/1836290/78199806b8e92fd9c3eae406a741c886/2021-01-14-bkm-neustartpdf-data.pdf?download=1",
        "https://www.bundesregierung.de/resource/blob/974430/1836290/78199806b8e92fd9c3eae406a741c886/2021-01-14-bkm-neustartpdf-data.pdf",
    ),
    # jsessionid (UrlCleanerTest.scala:81-91)
    (
        "https://www.bmas.de/SharedDocs/Downloads/DE/Arbeitsschutz/arbeitsschutzbehorden.pdf;jsessionid=B76B148565D3F794C5E8CD3E97BBB15A.delivery1-replication?__blob=publicationFile&v=1",
        "https://www.bmas.de/SharedDocs/Downloads/DE/Arbeitsschutz/arbeitsschutzbehorden.pdf?__blob=publicationFile&v=1",
    ),
    # shoppingCart (UrlCleanerTest.scala:93-103)
    (
        "https://www.auswaertiges-amt.de/blueprint/servlet/aa-publication-order/addToCart?contentId=216862&shoppingCart=216654",
        "https://www.auswaertiges-amt.de/blueprint/servlet/aa-publication-order/addToCart?contentId=216862",
    ),
    # cms_handOverParams (UrlCleanerTest.scala:105-115)
    (
        "https://www.onlinezugangsgesetz.de/Webs/OZG/DE/service/seite-empfehlen/functions/mailversand.html?cms_handOverParams=uriHash%253Db610DEUQNQNxKUCrut-rcFw3zR86OSw%25253D%2526uri%253Dhttps%25253A%25252F%25252Fwww.onlinezugangsgesetz.de%25252FSharedDocs%25252Fkurzmeldungen%25252FWebs%25252FOZG%25252FDE%25252F2020%25252Froentgen-und-co.html",
        "https://www.onlinezugangsgesetz.de/Webs/OZG/DE/service/seite-empfehlen/functions/mailversand.html",
    ),
]


@pytest.mark.parametrize("inp,expected", CLEAN_CASES)
def test_clean_url_goldens(inp, expected):
    assert clean_url(inp) == expected


def test_clean_url_vectorized_matches_scalar():
    ins = pd.Series([c[0] for c in CLEAN_CASES])
    outs = clean_url_series(ins)
    assert list(outs) == [c[1] for c in CLEAN_CASES]


def test_clean_url_jsessionid_mid_path():
    # regex applies per path segment (UrlCleaner.scala:37-49): content after
    # the segment survives
    assert (
        clean_url("https://h.de/a;jsessionid=XYZ/b.html")
        == "https://h.de/a/b.html"
    )


def test_clean_url_punycode_host():
    assert clean_url("https://müller.de/page.html") == "https://xn--mller-kva.de/page.html"


UNWANTED = [
    # search pages (UrlFilterSpec.scala:17-22)
    "https://www.example.de/867116!search?formState=eNptjztvwzAMhP9h7HsFT=*",
    "https://www.example.de/asd/aktuelles/867116!search?formState=eNptj00Lgk8BI3Ba4A&tf=867052:103440",
    # forms (UrlFilterSpec.scala:25-29)
    "https://www.bmvi.de/SiteGlobals/Forms/Listen/EN/News-From-The-Ministry/News-From-The-Ministry_Formular.html?nn=260752&queryResultId=null&pageNo=0&gtp=14468_liste%3D55%26212490_list%3D44#servicenav",
    # show=image (UrlFilterSpec.scala:39-46)
    "https://www.bpb.de/geschichte/deutsche-einheit/30-jahre-deutsche-einheit/314688/30-jahre-deutsche-einheit-bildergalerie?show=image&i=314693",
    "https://www.bpb.de/geschichte/deutsche-einheit/30-jahre-deutsche-einheit/314688/30-jahre-deutsche-einheit-bildergalerie?show=image&i=314725",
    "https://www.bpb.de/geschichte/deutsche-einheit/30-jahre-deutsche-einheit/314688/30-jahre-deutsche-einheit-bildergalerie?rel=noindex&type=galerie&show=image&i=314725",
    "https://www.bpb.de/gesellschaft/migration/afrikanische-diaspora/59569/brothers-keepers-story?type=galerie&show=image&i=59576",
    # warenkorb (UrlFilterSpec.scala:49-55)
    "https://www.bpb.de/shop/warenkorb/?addpub=7720",
    "https://www.bpb.de/shop/warenkorb",
    "https://www.bpb.de/warenkorb/",
    "https://www.bpb.de/shop/warenkorb/7720",
    # addToCart (UrlFilterSpec.scala:58-64)
    "https://www.auswaertiges-amt.de/blueprint/servlet/aa-publication-order/addToCart?contentId=216862&shoppingCart=216654",
    "https://www.bpb.de/shop/addToCart?",
    "https://www.bpb.de/warenkorb/addToCart",
    "https://www.bpb.de/addToCart/8",
]

WANTED = [
    "https://www.example.de/de/themen/222/123",
    "https://coverified.info",
]


@pytest.mark.parametrize("url", UNWANTED)
def test_unwanted_urls(url):
    assert wanted_url(url) is False


@pytest.mark.parametrize("url", WANTED)
def test_wanted_urls(url):
    assert wanted_url(url) is True


def test_is_valid_url():
    assert is_valid_url("https://example.com/abs.html")
    assert is_valid_url("https://example.com/cat0/sub/sub_page.html")
    assert not is_valid_url("https://example.com/cat0/|| invalid link ||")
    assert not is_valid_url("same_level.html")
    assert not is_valid_url("")
    assert not is_valid_url("mailto:x@example.com")


def test_url_host():
    assert url_host("https://www.example1.com/a/b?c=1") == "www.example1.com"
    assert url_host("http://h.de") == "h.de"
    assert url_host("not a url") is None


def test_strip_trailing_slash():
    # Supervisor.scala:221 / SupervisorSpec.scala:55-57: seed ".../"
    # scheduled without the slash
    assert strip_trailing_slash("https://www.example1.com/") == "https://www.example1.com"
    assert strip_trailing_slash("https://www.example1.com") == "https://www.example1.com"


