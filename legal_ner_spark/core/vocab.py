"""Closed-world vocabulary shared by the synthetic corpus generator and the
deterministic sandbox tagger.

The reference's NER is a spaCy transformer (`en_legal_ner_trf`,
/root/reference/legal_ner.py:57) that is not installable in this sandbox;
SURVEY.md §7.0 mandates a pluggable deterministic stand-in behind the same
mapInPandas signature.  The stand-in is a closed-vocabulary rule tagger: the
generator only plants surface forms listed here, and the tagger recognizes
exactly these forms, so correctness gates are model-independent.
"""

FIRST_NAMES = [
    "Amit", "Rajesh", "Sunil", "Madhu", "Ashok", "Vijay", "Ramesh", "Suresh",
    "Anil", "Prakash", "Meena", "Kavita", "Ravi", "Deepak", "Manoj", "Sanjay",
]

LAST_NAMES = [
    "Kumar", "Sharma", "Limaye", "Verma", "Patil", "Deshmukh", "Gupta",
    "Singh", "Joshi", "Rao", "Mehta", "Chavan", "Naik", "Pawar", "Iyer",
    "Reddy",
]

GPES = [
    "Maharashtra", "Delhi", "Karnataka", "Punjab", "Kerala", "Gujarat",
    "Mumbai", "Chennai", "Nagpur", "Pune",
]

ORGS = [
    "Central Bureau of Investigation", "State Bank of India",
    "Reserve Bank of India", "Life Insurance Corporation",
    "Municipal Corporation of Greater Mumbai",
]

COURTS = [
    "Supreme Court of India", "High Court of Judicature at Bombay",
    "High Court of Delhi", "High Court of Karnataka", "Sessions Court Pune",
]

# Statute surface forms.  The first group MOSTLY canonicalizes under the
# reference's 7-regex dictionary (postprocessing_utils.py:591-622) —
# EXCEPT 'Penal Code', which the reference's own _RE_IPC misses (it
# requires a leading i|indian), so that surface deliberately exercises
# the fallback path despite sitting with the IPC family; the second group
# misses the dictionary entirely (check_stat → '') and the statute's own
# text becomes the normalised form (postprocessing_utils.py:735).
STATUTES_CANONICAL = [
    "Indian Penal Code", "I.P.C.", "Penal Code",
    "Code of Criminal Procedure", "Cr.P.C.", "Criminal Procedure Code",
    "Constitution of India", "Constitution",
    "Income Tax Act", "Motor Vehicles Act", "M.V. Act",
    "Industrial Disputes Act", "SARFAESI Act",
]

STATUTES_OTHER = [
    "Prevention of Corruption Act", "Evidence Act",
    "Arbitration and Conciliation Act", "Negotiable Instruments Act",
    "Consumer Protection Act",
]

STATUTES = STATUTES_CANONICAL + STATUTES_OTHER

# Acts introduced with a parenthetical alias — exercises
# create_unidentified_statutes (postprocessing_utils.py:639-713).  The long
# form is what the tagger knows; the alias is only ever discovered by
# postprocessing.
ALIASED_ACTS = [
    ("Motor Vehicles Act, 1988", "MV Act"),
    ("Industrial Disputes Act, 1947", "ID Act"),
    ("Prevention of Money Laundering Act, 2002", "PML Act"),
]

MONTHS = [
    "January", "February", "March", "April", "May", "June", "July", "August",
    "September", "October", "November", "December",
]

CASE_TYPES = [
    "Criminal Appeal", "Civil Appeal", "Writ Petition", "Special Leave Petition",
]

# Verb lexicon for the deterministic preamble-guess stand-in (replaces spaCy
# POS tagging in guess_preamble_end, data_preparation.py:86-88).  Every verb
# the generator uses in judgment-body sentences is listed; the reference's
# exclusions live in preamble.py.
VERBS = {
    "is", "was", "were", "are", "be", "been", "has", "have", "had",
    "charged", "relied", "placed", "invoked", "provides", "recorded",
    "deposed", "held", "observed", "argued", "submitted", "dismissed",
    "allowed", "convicted", "distinguished", "filed", "stated", "contended",
    "alleged", "heard", "examined", "set", "quashed", "remanded", "granted",
    "rejected", "considered", "noted", "reserved", "pronounced", "dated",
    "signed", "occurred", "arrested", "sentenced", "acquitted",
}
