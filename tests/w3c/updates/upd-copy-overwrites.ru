COPY <urn:g1> TO <urn:g2>
