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
