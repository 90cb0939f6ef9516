"""Shim for the `inflect` package (not installed in this environment).

The reference imports it in utils/parse.py:7 and calls exactly two methods,
both only when a spec contains duplicate object names
(parse.py:340-342): engine().plural_noun(noun) and
engine().number_to_words(n). The mini implementation covers the regular
English cases those call sites hit for the benchmark vocabulary; anything
irregular raises so a silent wrong pluralization can't skew a parity test.
"""

_NUMBER_WORDS = {
    0: "zero", 1: "one", 2: "two", 3: "three", 4: "four", 5: "five",
    6: "six", 7: "seven", 8: "eight", 9: "nine", 10: "ten",
    11: "eleven", 12: "twelve", 13: "thirteen", 14: "fourteen",
    15: "fifteen", 16: "sixteen", 17: "seventeen", 18: "eighteen",
    19: "nineteen", 20: "twenty",
}

_IRREGULAR = {
    "person": "people", "child": "children", "man": "men", "woman": "women",
    "mouse": "mice", "goose": "geese", "foot": "feet", "tooth": "teeth",
    "sheep": "sheep", "fish": "fish", "deer": "deer",
}


class engine:  # noqa: N801 — inflect's public name
    def plural_noun(self, noun: str) -> str:
        words = noun.split(" ")
        head = words[-1]
        if head in _IRREGULAR:
            plural = _IRREGULAR[head]
        elif head.endswith(("s", "x", "z", "ch", "sh")):
            plural = head + "es"
        elif head.endswith("y") and head[-2:-1].lower() not in "aeiou":
            plural = head[:-1] + "ies"
        elif head.endswith(("f",)):
            plural = head[:-1] + "ves"
        elif head.endswith("fe"):
            plural = head[:-2] + "ves"
        else:
            plural = head + "s"
        return " ".join(words[:-1] + [plural])

    # utils/eval/lmd.py:113,139 calls it `plural`; parse.py calls it
    # `plural_noun` — same behavior for the noun phrases both feed it.
    def plural(self, noun: str) -> str:
        return self.plural_noun(noun)

    def number_to_words(self, n) -> str:
        n = int(n)
        if n not in _NUMBER_WORDS:
            raise NotImplementedError(f"inflect shim: number_to_words({n})")
        return _NUMBER_WORDS[n]
