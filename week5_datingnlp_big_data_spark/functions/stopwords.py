"""Stop-word lists and HTML-noise patterns shipped as engine data.

- ``CUSTOM_STOP_WORDS``: the reference's 31-word ad-hoc list
  (Week5_datingNLP.R:54), applied as a regex replace BEFORE tokenization.
- ``SNOWBALL_EN``: the 175-word snowball English list — what quanteda's
  ``stopwords()`` returns (Week5_datingNLP.R:78). MLlib's
  ``StopWordsRemover`` default list differs, so the list is pinned here as
  data for fidelity (SURVEY.md section 2.7 N2).
- ``HTML_PATTERNS``: the reference's HTML-strip alternation parts
  (Week5_datingNLP.R:53).
"""

from __future__ import annotations

# Week5_datingNLP.R:53 — alternation parts, kept verbatim as data.
HTML_PATTERNS: list[str] = [
    "<a[^>]+>",
    "class=[\"'][^\"']+[\"']",
    "&[a-z]+;",
    "\n",
    "\\\\n",  # the literal two-character sequence backslash-n
    "<br ?/>",
    "</[a-z]+ ?>",
]

# Week5_datingNLP.R:54 — the reference's custom pre-tokenization stop words.
CUSTOM_STOP_WORDS: list[str] = [
    "a", "am", "an", "and", "as", "at", "are", "be", "but", "can", "do",
    "for", "have", "i'm", "if", "in", "is", "it", "like", "love", "my",
    "of", "on", "or", "so", "that", "the", "to", "with", "you", "i",
]

# Snowball English stop-word list (public; snowballstem.org), 175 entries —
# identical to quanteda::stopwords("en").
SNOWBALL_EN: list[str] = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "would", "should", "could", "ought",
    "i'm", "you're", "he's", "she's", "it's", "we're", "they're", "i've",
    "you've", "we've", "they've", "i'd", "you'd", "he'd", "she'd", "we'd",
    "they'd", "i'll", "you'll", "he'll", "she'll", "we'll", "they'll",
    "isn't", "aren't", "wasn't", "weren't", "hasn't", "haven't", "hadn't",
    "doesn't", "don't", "didn't", "won't", "wouldn't", "shan't",
    "shouldn't", "can't", "cannot", "couldn't", "mustn't", "let's",
    "that's", "who's", "what's", "here's", "there's", "when's", "where's",
    "why's", "how's", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "should", "now",
]
