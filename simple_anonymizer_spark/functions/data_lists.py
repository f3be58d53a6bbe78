"""Frozen data lists for deterministic anonymization.

The reference (``src/Anonymizer.scala:46-63``) pulls curated lists from
DataFaker's YAML data at runtime. Our engine vendors its *own* frozen lists:
list contents AND order are part of the engine spec — ``list[stableHash(s) %
len(list)]`` only stays deterministic across versions if the lists never
change. Do not reorder, insert, or remove entries; append-only changes are
also forbidden (length changes the modulus).

The same lists feed all three implementations (Spark native expressions,
DuckDB oracle SQL, pure-Python test reference), so there is a single source
of truth and zero drift by construction.
"""

from __future__ import annotations

MALE_FIRST_NAMES: list[str] = [
    "James", "John", "Robert", "Michael", "William", "David", "Richard",
    "Joseph", "Thomas", "Charles", "Christopher", "Daniel", "Matthew",
    "Anthony", "Mark", "Donald", "Steven", "Paul", "Andrew", "Joshua",
    "Kenneth", "Kevin", "Brian", "George", "Timothy", "Ronald", "Edward",
    "Jason", "Jeffrey", "Ryan", "Jacob", "Gary", "Nicholas", "Eric",
    "Jonathan", "Stephen", "Larry", "Justin", "Scott", "Brandon",
]

FEMALE_FIRST_NAMES: list[str] = [
    "Mary", "Patricia", "Jennifer", "Linda", "Elizabeth", "Barbara",
    "Susan", "Jessica", "Sarah", "Karen", "Lisa", "Nancy", "Betty",
    "Margaret", "Sandra", "Ashley", "Kimberly", "Emily", "Donna",
    "Michelle", "Carol", "Amanda", "Dorothy", "Melissa", "Deborah",
    "Stephanie", "Rebecca", "Sharon", "Laura", "Cynthia", "Kathleen",
    "Amy", "Angela", "Shirley", "Anna", "Brenda", "Pamela", "Emma",
    "Nicole", "Helen",
]

# FirstName = male ++ female, mirroring Anonymizer.scala:52-57.
FIRST_NAMES: list[str] = MALE_FIRST_NAMES + FEMALE_FIRST_NAMES

LAST_NAMES: list[str] = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson",
    "Martin", "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez",
    "Clark", "Ramirez", "Lewis", "Robinson", "Walker", "Young", "Allen",
    "King", "Wright", "Scott", "Torres", "Nguyen", "Hill", "Flores",
    "Green", "Adams", "Nelson", "Baker", "Hall", "Rivera", "Campbell",
    "Mitchell", "Carter", "Roberts", "Gomez", "Phillips", "Evans",
    "Turner", "Diaz", "Parker", "Cruz", "Edwards", "Collins", "Reyes",
    "Stewart", "Morris", "Morales", "Murphy", "Cook", "Rogers",
    "Gutierrez", "Ortiz", "Morgan", "Cooper", "Peterson", "Bailey",
    "Reed", "Kelly", "Howard", "Ramos", "Kim", "Cox", "Ward",
    "Richardson",
]

STREET_SUFFIXES: list[str] = [
    "Street", "Avenue", "Boulevard", "Drive", "Lane", "Road", "Court",
    "Place", "Terrace", "Way", "Circle", "Alley", "Crossing", "Parkway",
    "Trail", "Plaza",
]

CITY_SUFFIXES: list[str] = [
    "town", "ville", "berg", "burgh", "borough", "bury", "view", "port",
    "mouth", "stad", "furt", "chester",
]

STATES: list[str] = [
    "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
    "Connecticut", "Delaware", "Florida", "Georgia", "Hawaii", "Idaho",
    "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky", "Louisiana",
    "Maine", "Maryland", "Massachusetts", "Michigan", "Minnesota",
    "Mississippi", "Missouri", "Montana", "Nebraska", "Nevada",
    "New Hampshire", "New Jersey", "New Mexico", "New York",
    "North Carolina", "North Dakota", "Ohio", "Oklahoma", "Oregon",
    "Pennsylvania", "Rhode Island", "South Carolina", "South Dakota",
    "Tennessee", "Texas", "Utah", "Vermont", "Virginia", "Washington",
    "West Virginia", "Wisconsin", "Wyoming",
]

STATE_ABBRS: list[str] = [
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI",
    "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI",
    "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC",
    "ND", "OH", "OK", "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT",
    "VT", "VA", "WA", "WV", "WI", "WY",
]

COUNTRIES: list[str] = [
    "United States", "Canada", "Mexico", "Brazil", "Argentina", "Chile",
    "United Kingdom", "France", "Germany", "Spain", "Italy", "Portugal",
    "Netherlands", "Belgium", "Switzerland", "Austria", "Sweden",
    "Norway", "Denmark", "Finland", "Poland", "Czechia", "Hungary",
    "Greece", "Turkey", "Russia", "China", "Japan", "South Korea",
    "India", "Indonesia", "Thailand", "Vietnam", "Philippines",
    "Australia", "New Zealand", "South Africa", "Egypt", "Nigeria",
    "Kenya",
]

# Email domains, mirroring Anonymizer.scala:95 exactly (safe non-routable-ish
# demo domains are part of the reference contract, it/DbCopierIntegrationTest).
EMAIL_DOMAINS: list[str] = ["example.com", "test.com", "fake.org", "sample.net"]

# 19-word lorem list, mirroring Anonymizer.scala:169-189 (public-domain text).
LOREM_WORDS: list[str] = [
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "ut",
    "labore", "et", "dolore", "magna", "aliqua",
]
