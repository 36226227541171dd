"""Self-validating regex rule registry.

Semantics mirror the reference engine's rule model
(``/root/reference/discoverx/rules.py:43-75`` — rules validate their own
match/nomatch examples at construction) and its built-in corpus
(``rules.py:114-510`` — 12 global rules + 6 US-locale rules, filtered with
Unix wildcards, ``rules.py:579-595``).  The regex *definitions* are the
behavioral contract (they decide classification parity / keep-drop F1), so
they are preserved verbatim as data; everything around them is new,
Spark-first code: rules compile both to anchored classification predicates
(used by :mod:`discoverx_spark.scanner` via ``F.regexp_like``) and to
unanchored, boundary-guarded scrub patterns (:mod:`discoverx_spark.scrub`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from fnmatch import fnmatch
from typing import Iterable, Optional


@dataclass(frozen=True)
class RegexRule:
    """A named, self-validating regular-expression classifier.

    Mirrors reference ``rules.py:28-75``: construction fails if any
    ``match_examples`` entry does not match, or any ``nomatch_examples``
    entry does match (``re.match`` semantics, like ``rules.py:72``).
    """

    name: str
    description: str
    pattern: str
    match_examples: tuple = ()
    nomatch_examples: tuple = ()
    class_name: Optional[str] = None

    def __post_init__(self) -> None:
        compiled = re.compile(self.pattern)
        for ex in self.match_examples:
            if not compiled.match(ex):
                raise ValueError(
                    f"rule {self.name!r}: match example {ex!r} does not match"
                )
        for ex in self.nomatch_examples:
            if compiled.match(ex):
                raise ValueError(
                    f"rule {self.name!r}: nomatch example {ex!r} matches"
                )

    @property
    def klass(self) -> str:
        return self.class_name or self.name

    def matches(self, value: str) -> bool:
        """Classification predicate (``re.match``, reference rules.py:110)."""
        return re.match(self.pattern, value) is not None


# ---------------------------------------------------------------------------
# Built-in corpus.  Pattern strings + examples are the parity contract with
# reference rules.py:114-510; kept byte-identical so the reference's own
# match/nomatch fixtures pass against this registry (keep/drop F1 anchor).
# ---------------------------------------------------------------------------

_G = [
    ("credit_card_expiration_date", "Credit Card Expiration Date",
     r"^\d{2}/\d{2}$",
     ["01/20", "12/25"],
     ["1/20", "01/2020", "01/2", "01/200"]),
    ("credit_card_number", "Credit Card Number",
     r"^\d{4}-\d{4}-\d{4}-\d{4}$",
     ["1234-5678-9012-3456", "9876-5432-1098-7654"],
     ["1234-5678-9012-345", "1234-5678-9012-34567", "1234-5678-9012-3456-7890"]),
    ("decimal_number", "Decimal Number",
     r"^-?\d+(?:[.,]\d*)?[eE]?-?\d{0,3}$",
     ["123.45", "-123.45", "1.1E2", "1.1E-1", "123,45", "-123,45",
      "123,0123", "-123,0", "123.", "123,", "-123.", "-123,"],
     ["", "123,456,789", "1$", "123,456.789"]),
    ("email", "Email address",
     r"^.+@[^\.].*\.[a-z]{2,}$",
     ["whatever@somewhere.museum", "foreignchars@myforeigncharsdomain.nu",
      "me+mysomething@mydomain.com"],
     ["a@b.c", "me@.my.com", "a@b.comFOREIGNCHAR"]),
    ("fqdn", "Fully Qualified Domain Names",
     r"^([-a-zA-Z0-9:%._\+~#=]{1,63}\.){1,8}[a-zA-Z]{1,12}\.?$",
     ["ec2-35-160-210-253.us-west-2-.compute.amazonaws.com",
      "ec2-35-160-210-253.us-west-2-.compute.amazonaws.com.mx.gmail.com.",
      "1.2.3.4.com", "xn--kxae4bafwg.xn--pxaix.gr"],
     ["so-me.na-me.567", "label.name.321",
      "1234567890-1234567890-1234567890-1234567890-12345678901234567890.123.com",
      "abc.cdf@mydoamain.com", "Some text abc.cdf.com"]),
    ("integer_number", "Integer Number",
     r"^-?\d+$",
     ["123", "-123", "0"],
     ["", "123.45", "123,45", "123,0", "123.0", "123,456,789", "1$"]),
    ("ip_v4", "IP address v4",
     r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
     ["192.1.1.1", "0.0.0.0"],
     ["192"]),
    ("ip_v6", "IP address v6",
     r"^(([0-9a-fA-F]{1,4}:){7,7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|:((:[0-9a-fA-F]{1,4}){1,7}|:)|fe80:(:[0-9a-fA-F]{0,4}){0,4}%[0-9a-zA-Z]{1,}|::(ffff(:0{1,4}){0,1}:){0,1}((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])|([0-9a-fA-F]{1,4}:){1,4}:((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9]))$",
     ["2001:db8:3333:4444:5555:6666:7777:8888", "::1234:5678", "2001:db8::", "::"],
     ["2001.0000"]),
    ("iso_date", "ISO Date",
     r"^\d{4}-\d{2}-\d{2}$",
     ["2020-01-01", "2020-12-31"],
     ["2020-01", "2020-01-01-01", "2020-01-01T01:01:01"]),
    ("iso_date_time", "ISO Date Time",
     r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$",
     ["2020-01-01T01:01:01", "2020-12-31T23:59:59"],
     ["2020-01", "2020-01-01", "2020-01-01-01"]),
    ("mac_address", "MAC Addresses",
     r"^(?=[-:\w]*[a-fA-F]+[-:\w]*)(([0-9A-Fa-f]{2}[:-]?){5}([0-9A-Fa-f]{2}))$",
     ["01:02:03:04:ab:cd", "01-02-03-04-ab-cd", "0102-0304-abcd", "01020304abcd"],
     ["01:02:03:04:ab", "01.02.03.04.ab.cd", "01:02:03:04:05:06"]),
    ("url", "URL",
     r"^(https?|ftp|file|mailto):\/\/(?:www\.)?[-a-zA-Z0-9@:%._\+~#=]{1,256}\.[a-zA-Z0-9()]{1,6}\b(?:[-a-zA-Z0-9()@:%_\+.~#?&\/=]*)$",
     ["http://www.domain.com", "http://domain.com", "https://domain.com",
      "https://sub.domain-name.com:8080",
      "http://domain.com/dir%201/dir_2/program.ext?var1=x&var2=my%20value",
      "ftp://domain.com/index.html#bookmark", "file://domain.com/abc.txt"],
     ["Some text http://domain.com", "http://domain.com some text", "my@email.com"]),
]

_US_STATES = (
    "Alabama|Alaska|American Samoa|Arizona|Arkansas|California|Colorado|"
    "Connecticut|Delaware|District of Columbia|Federated States of Micronesia|"
    "Florida|Georgia|Guam|Hawaii|Idaho|Illinois|Indiana|Iowa|Kansas|Kentucky|"
    "Louisiana|Maine|Marshall Islands|Maryland|Massachusetts|Michigan|"
    "Minnesota|Mississippi|Missouri|Montana|Nebraska|Nevada|New Hampshire|"
    "New Jersey|New Mexico|New York|North Carolina|North Dakota|"
    "Northern Mariana Islands|Ohio|Oklahoma|Oregon|Palau|Pennsylvania|"
    "Puerto Rico|Rhode Island|South Carolina|South Dakota|Tennessee|Texas|"
    "Utah|Vermont|Virgin Islands|Virginia|Washington|West Virginia|"
    "Wisconsin|Wyoming"
)

_US_STATE_ABBR = (
    "AL|AK|AS|AZ|AR|CA|CO|CT|DE|DC|FM|FL|GA|GU|HI|ID|IL|IN|IA|KS|KY|LA|ME|MH|"
    "MD|MA|MI|MN|MS|MO|MT|NE|NV|NH|NJ|NM|NY|NC|ND|MP|OH|OK|OR|PW|PA|PR|RI|SC|"
    "SD|TN|TX|UT|VT|VI|VA|WA|WV|WI|WY"
)

_US = [
    ("us_mailing_address", "US Mailing Address",
     r"^\d+\s[A-z]+\s[A-z]+",
     ["123 Main St", "456 Elm St", "789 Pine St"],
     ["123 Main", "456 Elm", "789 Pine"]),
    ("us_phone_number", "US Phone Number",
     r"^\+?1?[-. (]*(\d{3})[-. )]*(\d{3})[-. ]*(\d{4})$",
     ["+1 (123) 456-7890", "123-456-7890", "123.456.7890", "1234567890",
      "(123)456-7890"],
     ["123-45-6789", "987-65-4321"]),
    ("us_social_security_number", "US Social Security Number",
     r"^(?!000|666|9)\d{3}-(?!00)\d{2}-(?!0000)\d{4}$",
     ["123-45-6789"],
     ["123-45-678", "123-456-7890", "123-45-67890", "123-456-789"]),
    ("us_state", "US State",
     r"(?i)^(" + _US_STATES + r")$",
     ["Alabama", "New York", "Wyoming"],
     ["AL", "NY", "WY"]),
    ("us_state_abbreviation", "US State Abbreviation",
     r"(?i)^(" + _US_STATE_ABBR + r")$",
     ["AL", "NY", "WY", "al"],
     ["Alabama", "New York", "XX"]),
    ("us_zip_code", "US Zip Code",
     r"^\d{5}(?:[-\s]\d{4})?$",
     ["12345", "12345-6789"],
     ["1234", "123456"]),
]


def _build(defs) -> tuple:
    return tuple(
        RegexRule(name=n, description=d, pattern=p,
                  match_examples=tuple(m), nomatch_examples=tuple(nm))
        for (n, d, p, m, nm) in defs
    )


GLOBAL_RULES: tuple = _build(_G)
LOCALIZED_RULES: dict = {"us": _build(_US)}


class Rules:
    """Registry of built-in + custom rules with wildcard filtering.

    API parity with reference ``rules.py:513-606`` (``get_rules`` with Unix
    wildcard, ``match_search_term``), locale handling per ``rules.py:529-535``.
    """

    def __init__(self, locale: Optional[str] = None,
                 custom_rules: Optional[Iterable[RegexRule]] = None):
        rules = list(GLOBAL_RULES)
        if locale is not None:
            key = locale.lower()
            if key not in LOCALIZED_RULES:
                raise ValueError(
                    f"Unsupported locale: {locale}. "
                    f"Use one of {sorted(LOCALIZED_RULES)}"
                )
            rules.extend(LOCALIZED_RULES[key])
        self.builtin_rules: list = rules
        self.custom_rules: list = list(custom_rules or [])

    def get_rules(self, rule_filter: str = "*") -> list:
        """All built-in + custom rules whose name matches the wildcard."""
        return (
            [r for r in self.builtin_rules if fnmatch(r.name, rule_filter)]
            + [r for r in self.custom_rules if fnmatch(r.name, rule_filter)]
        )

    def match_search_term(self, search_term: str) -> list:
        """Names of rules matching a literal value (reference rules.py:601-606)."""
        return [r.name for r in self.builtin_rules + self.custom_rules
                if r.matches(search_term)]
