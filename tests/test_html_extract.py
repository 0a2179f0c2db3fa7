"""HTML boilerplate strip + main-content scoring (M11)."""

from docling_api_ray.sources.synth import make_html_page
from docling_api_ray.stages.html_extract import extract_main_content


def test_roundtrip_plain_text():
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    text = text.strip()
    res = extract_main_content(make_html_page(text))
    assert res.main_text == text


def test_roundtrip_xhtml():
    text = "one two three four five six seven eight nine ten eleven twelve thirteen"
    res = extract_main_content(make_html_page(text, xhtml=True))
    assert res.main_text == text


def test_boilerplate_dropped():
    res = extract_main_content(make_html_page("real content words here"))
    joined = res.main_text
    for bp in ("home", "alpha", "terms", "privacy", "copyright", "var t", "color"):
        assert bp not in joined


def test_link_density_scoring():
    html = (
        "<html><body>"
        '<div><a href="/1">l1</a> <a href="/2">l2</a> <a href="/3">l3</a> x</div>'
        "<div>genuinely long body text with no links at all in it</div>"
        "</body></html>"
    )
    res = extract_main_content(html)
    assert res.main_text == "genuinely long body text with no links at all in it"
    assert res.dropped == 1


def test_moderate_links_kept():
    html = (
        "<html><body><p>a long paragraph of body text that happens to contain "
        'one <a href="/x">link</a> somewhere inside it and keeps going on</p>'
        "</body></html>"
    )
    res = extract_main_content(html)
    assert "link" in res.main_text and res.dropped == 0


def test_images_collected_in_content_only():
    html = (
        '<html><body><nav><img src="logo.png"/></nav>'
        '<main><p>text</p><img src="figure.png"/></main></body></html>'
    )
    res = extract_main_content(html)
    assert res.images == ["figure.png"]


def test_script_style_always_dropped():
    html = "<html><head><style>p{}</style></head><body><script>x=1</script><p>keep</p></body></html>"
    assert extract_main_content(html).main_text == "keep"


def test_malformed_html_no_crash():
    res = extract_main_content("<div><p>unclosed everything")
    assert res.main_text == "unclosed everything"


def test_empty():
    assert extract_main_content("").main_text == ""


def test_fast_scanner_equivalent_to_reference():
    """The compiled-regex scanner must produce the identical
    ExtractResult to the stdlib-HTMLParser reference on corpus-shaped
    and adversarial inputs."""
    import pyarrow.parquet as pq

    from docling_api_ray.sources.synth import make_body
    from docling_api_ray.stages.html_extract import (
        extract_main_content,
        extract_main_content_reference,
    )

    cases = [
        "",
        "plain text, no tags at all",
        "<p>Hello &amp; goodbye &lt;world&gt;</p>",
        "<div><script>var x = '<p>not a tag</p>';</script><p>kept</p></div>",
        "<style>p { color: red; } /* </div> inside comment? no: style is rawtext */</style><p>after</p>",
        "<nav><a href=x>home</a><div><a href=y>more nav</a></div></nav><p>content</p>",
        "<p>text with <a href='#'>a link</a> inside</p>",
        "<ul><li>one</li><li>two &#65;</li></ul>",
        "<img src=\"pic.png\"><img src='q.png'/><img src=bare.png><img src=trail/><img>",
        "<br/><br /><hr>text<br>more",
        "<!-- comment with <p>tag</p> inside --><p>real</p>",
        "<!DOCTYPE html><html><head><title>t</title></head><body><p>b</p></body></html>",
        "<p>unclosed paragraph",
        "<P>UPPER CASE TAGS</P><DIV>block</DIV>",
        "<a href=1>x</a><a href=2>y</a>" * 30,  # link wall → dropped
        "<td>cell</td><th>head</th><figure>f<figcaption>c</figcaption></figure>",
        "text < notatag > more",
        "<p>entity in attr: <img src=\"a&amp;b.png\"></p>",
        "<form><input value=x><button>go</button></form><p>kept2</p>",
        "<aside>side</aside><article>main article text here</article>",
        "<div>pre<script src=x.js></script>post</div>",
        "<svg><circle r=1 /></svg><p>after svg</p>",
        "nested <div><div><div>deep</div></div></div> done",
        "<blockquote>quote</blockquote><pre>  pre  formatted  </pre>",
        "<!-- unterminated comment <p>gone",
        "<p>mixed &quot;quotes&quot; &#x41; &unknown; text</p>",
    ]
    # corpus-shaped synthetic html bodies
    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    for i in range(0, 60, 7):
        cases.append(
            "<html><body>"
            + "".join(
                f"<p>{w}</p>" for w in make_body(i, tbl["text"][i].as_py()).split()
            )
            + "</body></html>"
        )

    for html in cases:
        ref = extract_main_content_reference(html)
        fast = extract_main_content(html)
        assert fast.segments == ref.segments, html[:120]
        assert fast.dropped == ref.dropped, html[:120]
        assert fast.images == ref.images, html[:120]


def test_fast_scanner_equivalence_fuzz():
    """Property: on arbitrary tag-soup strings the fast scanner and the
    stdlib-parser reference produce identical results."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docling_api_ray.stages.html_extract import (
        extract_main_content,
        extract_main_content_reference,
    )

    fragment = st.sampled_from([
        "<p>", "</p>", "<div>", "</div>", "<a href=x>", "</a>", "<img src=y>",
        "<br/>", "<br />", "<script>", "</script>", "<style>", "</style>",
        "<nav>", "</nav>", "<!-- c -->", "<!--", "<!doctype html>", "< ",
        "</ ", "<", ">", "text ", "wo&amp;rd", "&lt;", "&#65;", " \n ",
        "<td>", "</td>", "<ul>", "</ul>", "<li>", "</li>", "&", "x<y",
        "<p class='c'>", "<img src='q'/>", "<img src=bare/>", "<?pi?>",
        "<![CDATA[z]]>", "<foo@bar>", "</p >", "</ p>",
    ])

    @settings(max_examples=300, deadline=None)
    @given(st.lists(fragment, max_size=25))
    def check(parts):
        html = "".join(parts)
        ref = extract_main_content_reference(html)
        fast = extract_main_content(html)
        assert fast.segments == ref.segments, html
        assert fast.dropped == ref.dropped, html
        assert fast.images == ref.images, html

    check()


def test_fast_scanner_equivalence_char_soup():
    """Property: even on arbitrary character soup (not HTML-shaped at
    all) the scanner matches the stdlib reference — including its
    abort-on-bad-marked-section and incomplete-construct behaviors."""
    import random

    from docling_api_ray.stages.html_extract import (
        extract_main_content,
        extract_main_content_reference,
    )

    rng = random.Random(4242)
    alphabet = "<>/!?='\"abc pI& ;-[]\n\tx"
    for _ in range(2000):
        html = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 60))
        )
        ref = extract_main_content_reference(html)
        fast = extract_main_content(html)
        assert (fast.segments, fast.dropped, fast.images) == (
            ref.segments, ref.dropped, ref.images,
        ), repr(html)
