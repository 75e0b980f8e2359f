#!/usr/bin/env python3
"""Stand-in for the reference test script
itests/util/src/main/java/org/apache/hadoop/hive/scripts/extracturl.java:
emits '<url>\t1' for every <a href="http://NNN.html">link</a> match on
stdin (input37.q's MAP ... USING 'java -cp ... extracturl')."""

import re
import sys

PAT = re.compile(r"<a href=\"http://([\w\d]+\.html)\">link</a>", re.IGNORECASE)

for line in sys.stdin:
    for m in PAT.finditer(line):
        sys.stdout.write(m.group(1) + "\t1\n")
