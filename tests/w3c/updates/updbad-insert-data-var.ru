INSERT DATA { ?s <urn:p> <urn:o> }
