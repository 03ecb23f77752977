INSERT DATA { GRAPH ?g { <urn:s> <urn:p> <urn:o> } }
