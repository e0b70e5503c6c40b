"""Regex -> token-level DFA compiler for constrained decoding.

Bridges the last gap in structured output: `ServingEngine(dfa=...)`
consumes a token-level automaton; this module COMPILES one from a regex
and the vocabulary's token spellings. Classic pipeline, implemented from
scratch (no external regex engine drives generation):

  regex (subset)  --Thompson-->  NFA  --subset construction-->  char DFA
  --coaccessibility pruning-->  live char DFA  --walk each token's
  spelling-->  token-level {bias, transitions, accepting}.

Supported syntax: literals, escapes (\\d \\w \\s \\. etc.), '.',
character classes `[a-z0-9_]` (ranges, leading-^ negation), grouping
`( )`, alternation `|`, quantifiers `* + ?`. Anchored semantics: the
generated text must match the WHOLE pattern; `eos_token_id` (when
given) is permitted exactly in accepting states. Coaccessibility
pruning bans any token that would strand the automaton in a state from
which no accepting state is reachable, so every emitted prefix extends
to a full match.

Token spellings are plain Python strings (use your tokenizer's
`convert_ids_to_tokens` / byte-decoder output); tokens whose spelling
contains characters the pattern can never consume are simply banned in
every state.
"""

from __future__ import annotations

import numpy as np

EPS = None  # epsilon edge marker


class _Frag:
    __slots__ = ("start", "outs")

    def __init__(self, start, outs):
        self.start = start
        self.outs = outs  # list of (state, slot) patch points


class _Nfa:
    def __init__(self):
        self.edges: list[list] = []  # state -> [(pred|EPS, target|None)]

    def state(self) -> int:
        self.edges.append([])
        return len(self.edges) - 1

    def add(self, s, pred, t):
        self.edges[s].append([pred, t])
        return (s, len(self.edges[s]) - 1)

    def patch(self, outs, target):
        for s, i in outs:
            self.edges[s][i][1] = target


_CLASSES = {
    "d": lambda c: c.isdigit(),
    "D": lambda c: not c.isdigit(),
    "w": lambda c: c.isalnum() or c == "_",
    "W": lambda c: not (c.isalnum() or c == "_"),
    "s": lambda c: c.isspace(),
    "S": lambda c: not c.isspace(),
}


def _parse(pattern: str):
    """Recursive-descent parse + Thompson construction. Returns
    (nfa, start_state, accept_state)."""
    nfa = _Nfa()
    pos = [0]

    def peek():
        return pattern[pos[0]] if pos[0] < len(pattern) else None

    def eat():
        c = pattern[pos[0]]
        pos[0] += 1
        return c

    def parse_class():
        # '[' already consumed.
        negated = False
        if peek() == "^":
            eat()
            negated = True
        items = []
        while peek() not in (None, "]"):
            c = eat()
            if c == "\\":
                e = eat()
                if e in _CLASSES:
                    items.append(("fn", _CLASSES[e]))
                    continue
                c = e
            if peek() == "-" and pos[0] + 1 < len(pattern) \
                    and pattern[pos[0] + 1] != "]":
                eat()
                hi = eat()
                lo_c, hi_c = c, hi
                items.append(("range", lo_c, hi_c))
            else:
                items.append(("char", c))
        assert peek() == "]", f"unterminated class in {pattern!r}"
        eat()

        def pred(ch, items=tuple(items), negated=negated):
            hit = False
            for it in items:
                if it[0] == "char" and ch == it[1]:
                    hit = True
                elif it[0] == "range" and it[1] <= ch <= it[2]:
                    hit = True
                elif it[0] == "fn" and it[1](ch):
                    hit = True
            return hit != negated

        return pred

    def atom():
        c = peek()
        if c == "(":
            eat()
            f = alternation()
            assert peek() == ")", f"unbalanced ( in {pattern!r}"
            eat()
            return f
        if c == "[":
            eat()
            pred = parse_class()
        elif c == ".":
            eat()
            pred = lambda ch: ch != "\n"
        elif c == "\\":
            eat()
            e = eat()
            if e in _CLASSES:
                pred = _CLASSES[e]
            else:
                pred = lambda ch, e=e: ch == e
        else:
            lit = eat()
            pred = lambda ch, lit=lit: ch == lit
        s = nfa.state()
        out = nfa.add(s, pred, None)
        return _Frag(s, [out])

    def quantified():
        f = atom()
        while peek() in ("*", "+", "?"):
            q = eat()
            if q == "*":
                s = nfa.state()
                e1 = nfa.add(s, EPS, f.start)
                e2 = nfa.add(s, EPS, None)
                nfa.patch(f.outs, s)
                f = _Frag(s, [e2])
            elif q == "+":
                s = nfa.state()
                e1 = nfa.add(s, EPS, f.start)
                e2 = nfa.add(s, EPS, None)
                nfa.patch(f.outs, s)
                f = _Frag(f.start, [e2])
            else:  # ?
                s = nfa.state()
                nfa.add(s, EPS, f.start)
                e2 = nfa.add(s, EPS, None)
                f = _Frag(s, f.outs + [e2])
        return f

    def concat():
        frags = []
        while peek() not in (None, "|", ")"):
            frags.append(quantified())
        if not frags:
            s = nfa.state()
            out = nfa.add(s, EPS, None)
            return _Frag(s, [out])
        f = frags[0]
        for g in frags[1:]:
            nfa.patch(f.outs, g.start)
            f = _Frag(f.start, g.outs)
        return f

    def alternation():
        f = concat()
        while peek() == "|":
            eat()
            g = concat()
            s = nfa.state()
            nfa.add(s, EPS, f.start)
            nfa.add(s, EPS, g.start)
            f = _Frag(s, f.outs + g.outs)
        return f

    frag = alternation()
    assert pos[0] == len(pattern), f"trailing junk in {pattern!r}"
    accept = nfa.state()
    nfa.patch(frag.outs, accept)
    return nfa, frag.start, accept


def _eclose(nfa, states):
    stack = list(states)
    seen = set(states)
    while stack:
        s = stack.pop()
        for pred, t in nfa.edges[s]:
            if pred is EPS and t not in seen:
                seen.add(t)
                stack.append(t)
    return frozenset(seen)


def compile_regex_dfa(
    pattern: str,
    token_strings: list[str],
    eos_token_id: int | None = None,
) -> dict:
    """Compile an anchored regex into the engine's token-level automaton.

    Returns {"bias": [n_states, V] f32 (0 allowed / -inf banned),
    "transitions": [n_states, V] int32, "start": 0, "accepting":
    [n_states] bool}. State 0 is the start; a dead sink state exists
    internally but every transition into it is banned, so the engine
    never reaches it."""
    nfa, start, accept = _parse(pattern)

    # Alphabet: only characters that actually occur in token spellings
    # can ever be consumed.
    alphabet = sorted({c for t in token_strings for c in t})

    def step_chars(stateset, ch):
        nxt = set()
        for s in stateset:
            for pred, t in nfa.edges[s]:
                if pred is not EPS and pred(ch):
                    nxt.add(t)
        return _eclose(nfa, nxt) if nxt else frozenset()

    # Subset construction over the observed alphabet.
    start_set = _eclose(nfa, {start})
    sets = {start_set: 0}
    order = [start_set]
    char_trans: list[dict] = [{}]
    i = 0
    while i < len(order):
        cur = order[i]
        for ch in alphabet:
            nxt = step_chars(cur, ch)
            if not nxt:
                continue
            if nxt not in sets:
                sets[nxt] = len(order)
                order.append(nxt)
                char_trans.append({})
            char_trans[i][ch] = sets[nxt]
        i += 1

    accepting = np.array([accept in s for s in order], bool)

    # Coaccessibility: states from which an accepting state is reachable.
    n = len(order)
    coacc = accepting.copy()
    changed = True
    while changed:
        changed = False
        for s in range(n):
            if coacc[s]:
                continue
            if any(coacc[t] for t in char_trans[s].values()):
                coacc[s] = True
                changed = True

    # Token-level automaton: walk each spelling through the char DFA.
    v = len(token_strings)
    bias = np.full((n, v), -np.inf, np.float32)
    trans = np.zeros((n, v), np.int32)
    for tok, spelling in enumerate(token_strings):
        if eos_token_id is not None and tok == eos_token_id:
            continue  # handled below (accepting states only)
        for s in range(n):
            cur = s
            ok = True
            for ch in spelling:
                cur = char_trans[cur].get(ch)
                if cur is None:
                    ok = False
                    break
            if ok and spelling and coacc[cur]:
                bias[s, tok] = 0.0
                trans[s, tok] = cur
    if eos_token_id is not None:
        # EOS permitted exactly where the match is complete; it keeps the
        # automaton in place (the engine stops the request anyway).
        for s in range(n):
            if accepting[s]:
                bias[s, eos_token_id] = 0.0
                trans[s, eos_token_id] = s

    return {
        "bias": bias,
        "transitions": trans,
        "start": 0,
        "accepting": accepting,
    }
