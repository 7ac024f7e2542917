"""Rule-compiler unit tests (pure Python, no Ray)."""

import re

from sagan_ray.rules import load_rules_file, parse_rule, parse_rules
from sagan_ray.pipelines.flagship import DEFAULT_RULES
from sagan_ray.stages.match import check_content_chain


def test_parse_basic():
    r = parse_rule(
        'alert any any any -> any any (msg:"hello"; content:"foo"; nocase; '
        'classtype:bad-unknown; sid:42; rev:3;)'
    )
    assert r.sid == 42 and r.rev == 3 and r.msg == "hello"
    assert r.classtype == "bad-unknown" and r.priority == 2
    assert len(r.contents) == 1 and r.contents[0].nocase


def test_parse_negated_and_chain():
    r = parse_rule(
        'alert any any any -> any any (msg:"m"; content:"a"; offset:5; depth:10; '
        'content:!"bad"; content:"b"; distance:2; within:8; sid:1;)'
    )
    a, neg, b = r.contents
    assert a.offset == 5 and a.depth == 10 and not a.relative
    assert neg.negated
    assert b.distance == 2 and b.within == 8 and b.relative


def test_hex_decode():
    r = parse_rule('alert any any any -> any any (content:"a|0A 0D|b"; sid:1;)')
    assert r.contents[0].pattern == "a\n\rb"


def test_pcre_flags_and_negation():
    r = parse_rule('alert any any any -> any any (pcre:"/ab+c/i"; pcre:!"/xyz/"; sid:1;)')
    assert r.pcres[0].flags & re.I and not r.pcres[0].negated
    assert r.pcres[1].negated
    assert r._pcre_compiled[0].search("xABBc")


def test_meta_content_var():
    rules, vt = parse_rules(
        "var WORDS [aa, bb, cc]\n"
        'alert any any any -> any any (meta_content:"x_%sagan%",$WORDS; sid:9;)'
    )
    assert vt["WORDS"] == ["aa", "bb", "cc"]
    assert rules[0].meta_contents[0].literals() == ("x_aa", "x_bb", "x_cc")


def test_threshold_after_xbits():
    r = parse_rule(
        "alert any any any -> any any (sid:5; "
        "threshold: type limit, track by_host, count 2, seconds 3600; "
        "xbits:set,mybit,track by_host,expire 600;)"
    )
    assert r.threshold.ttype == "limit" and r.threshold.count == 2
    assert r.threshold.seconds == 3600
    assert r.xbits[0].name == "mybit" and r.xbits[0].expire == 600

    r2 = parse_rule(
        "alert any any any -> any any (sid:6; after: track by_lang, count 5, seconds 60;)"
    )
    assert r2.after.count == 5 and r2.after.track == "by_lang"


def test_alert_time():
    r = parse_rule(
        'alert any any any -> any any (sid:7; alert_time: days 012345, hours 0800-1800;)'
    )
    assert r.alert_time.days == frozenset(range(6))
    assert (r.alert_time.start_hour, r.alert_time.end_hour) == (8, 18)


def test_program_glob():
    r = parse_rule('alert any any any -> any any (sid:8; program:"web*|api.example.com";)')
    assert r._program_re.match("webserver01")
    assert r._program_re.match("api.example.com")
    assert not r._program_re.match("mail.example.com")


def test_default_rules_file_loads():
    rules = load_rules_file(DEFAULT_RULES)
    assert len(rules) == 12
    sids = {r.sid for r in rules}
    assert sids == set(range(1000001, 1000013))


def test_content_chain_semantics():
    r = parse_rule(
        'alert any any any -> any any (sid:1; content:"key"; offset:0; depth:200; '
        'content:"value"; distance:1; within:120;)'
    )
    assert check_content_chain("key xx value", r.contents)
    # value starts immediately after key (distance 1 => gap required)
    assert not check_content_chain("keyvalue", r.contents)
    assert check_content_chain("key value", r.contents)  # gap of 1 (the space)
    assert not check_content_chain("value key", r.contents)
    # key beyond depth
    assert not check_content_chain((" " * 201) + "key value", r.contents)
    # value beyond within window
    assert not check_content_chain("key" + (" " * 125) + "value", r.contents)


def test_snort_compat_options():
    """Snort-compatible surface: flowbits alias (set/isset + bare
    noalert), informational options (reference/metadata/gid/
    fast_pattern/target) accepted and ignored."""
    rules, _ = parse_rules(
        'alert any any any -> any any (sid:1; msg:"t"; content:"x"; '
        "reference:url,example.com/a; metadata:author foo; fast_pattern; "
        "gid:1; rev:7; flowbits:set,brute.force; classtype:misc-activity;)\n"
        'alert any any any -> any any (sid:2; content:"y"; '
        "flowbits:isset,brute.force; classtype:misc-activity;)\n"
        'alert any any any -> any any (sid:3; content:"z"; '
        "flowbits:noalert; classtype:misc-activity;)"
    )
    assert rules[0].xbits[0].action == "set"
    assert rules[0].xbits[0].name == "brute.force"
    assert rules[1].xbits[0].action == "isset"
    assert rules[2].noalert and not rules[2].xbits
